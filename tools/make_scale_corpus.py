#!/usr/bin/env python3
"""Synthesize a 10x-sf0.1 corpus for the full-registry scale sweep
(VERDICT r09 item 3: catch scale-dependent quantization flips at ~sf1).

Facts (events, lineitem, orders, documents, embeddings) are replicated
K times with key offsets; copy 0 is byte-identical so every anchored
query (vec_id=0, doc_id=0, PIT symbol) still finds its anchor rows.
Events copies are shifted forward in time by k*(span+1us) so per-symbol
histories grow 10x chronologically (the shape a longer retention window
produces). Document copies get a distinct suffix token (and recomputed
n_chars) so the dedup tier sees near-dup families, not a degenerate
10-way exact-dup explosion. Dims (customer/supplier/part/nation/region)
stay as-is: 10x facts on fixed dims is exactly how real scale-up looks.

Both engines read the SAME synthesized parquet, so the DuckDB compare
stays value-exact.
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(DST, exist_ok=True)

def copy_as_is(name):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet")

for dim in ["customer", "supplier", "part", "nation", "region"]:
    copy_as_is(dim)

def replicate(name, offset_cols, per_copy=None):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    n = t.num_rows
    copies = []
    for k in range(K):
        c = t
        for col, base in offset_cols.items():
            arr = pc.add(c[col], pa.scalar(k * base, type=c[col].type))
            c = c.set_column(c.schema.get_field_index(col), col, arr)
        if per_copy is not None:
            c = per_copy(c, k)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(name, n, "->", out.num_rows)

# events: ids offset by 1e9 (keeps event_id%7/%11/%100 bid/ask/volume cycles
# aligned since 1e9 % 700? -- volume/bid/ask derive from event_id, values
# WILL differ per copy; that is fine, both engines see the same ids);
# ts shifted by k*(span+1us) so copies append chronologically.
ev = pq.read_table(f"{SRC}/events.parquet")
span = pc.max(ev["ts"]).value - pc.min(ev["ts"]).value  # microseconds
def ev_shift(c, k):
    shifted = pc.add(c["ts"].cast(pa.int64()), pa.scalar(k * (span + 1)))
    return c.set_column(c.schema.get_field_index("ts"), "ts",
                        shifted.cast(pa.timestamp("us")))
replicate("events", {"event_id": 1_000_000_000}, ev_shift)

replicate("lineitem", {"l_orderkey": 1_000_000_000})
replicate("orders", {"o_orderkey": 1_000_000_000, "o_custkey": 0})

def doc_suffix(c, k):
    if k == 0:
        return c
    texts = pc.binary_join_element_wise(
        c["text"], pa.scalar(f"variant{k}"), " ")
    nch = pc.utf8_length(texts).cast(pa.int64())
    c = c.set_column(c.schema.get_field_index("text"), "text", texts)
    return c.set_column(c.schema.get_field_index("n_chars"), "n_chars", nch)
replicate("documents", {"doc_id": 1_000_000}, doc_suffix)

def emb_perturb(c, k):
    # copies keep identical embeddings; vec_id offset only. Identical
    # vectors across copies stress tie-breaking determinism in ANN/topk --
    # the harshest case for cross-engine ordering agreement.
    return c
replicate("embeddings", {"vec_id": 1_000_000}, emb_perturb)
print("done ->", DST)
