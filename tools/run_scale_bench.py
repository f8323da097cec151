#!/usr/bin/env python3
"""ONE entry point for the standing 10x scale artifact (BENCH_SCALE.json):

  1. build the ~sf1 corpus (tools/make_scale_corpus.py, 10x sf0.1) if absent
  2. run the full-registry DuckDB correctness sweep on it (value-exact gate)
  3. run graft.Bench at sf0.1 and at the 10x corpus (same binary, same
     machine, back to back so the calibration anchors are comparable)
  4. write BENCH_SCALE.json: totals, calibrations, the wall-time scaling
     ratio for 10x data, per-query ratios (worst tail named), and the
     correctness counts — the "3x wall for 10x data" claim as a
     regenerable artifact instead of narration.

Usage: python3 tools/run_scale_bench.py [--corpus DIR] [--reps N]
                                        [--out BENCH_SCALE.json]
                                        [--skip-correctness]
"""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"


def arg(flag, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


def run_bench(sf_dir, reps, out_path):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_REPS=str(reps),
               SPARK_GRAFT_BENCH_OUT=out_path)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"bench failed at {sf_dir} (rc={r.returncode})")
    with open(out_path) as f:
        return json.load(f)


def main():
    corpus = arg("--corpus", "/tmp/sfbig")
    reps = int(arg("--reps", "1"))
    out = arg("--out", os.path.join(REPO, "BENCH_SCALE.json"))

    # 1. corpus (idempotent: reuse if the marker table already exists)
    if not os.path.exists(f"{corpus}/events.parquet"):
        subprocess.run([sys.executable, f"{REPO}/tools/make_scale_corpus.py",
                        SF01, corpus], check=True)

    # 2. correctness at scale: the full registry value-exact vs DuckDB
    correctness = {"ran": False, "ok": None, "bad": None}
    if "--skip-correctness" not in sys.argv:
        r = subprocess.run(
            [sys.executable, f"{REPO}/tools/check_correctness.py",
             corpus, "/tmp/verify_out_scale"],
            capture_output=True, text=True)
        tail = [l for l in r.stdout.splitlines() if " ok / " in l]
        if tail:
            ok, bad = tail[-1].split(" ok / ")
            correctness = {"ran": True, "ok": int(ok.strip()),
                           "bad": int(bad.split()[0].strip())}
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-6000:])
            raise SystemExit("correctness sweep FAILED at scale corpus")

    # 3. bench both SFs with the same binary, same reps
    b1 = run_bench(SF01, reps, "/tmp/bench_sf01.json")
    b10 = run_bench(corpus, reps, "/tmp/bench_scale.json")

    # 4. ratios
    q1, q10 = b1["queries"], b10["queries"]
    ratios = {k: round(q10[k] / q1[k], 2)
              for k in q1 if k in q10 and q1[k] > 0 and q10[k] >= 0}
    worst = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:10])
    med = sorted(ratios.values())[len(ratios) // 2] if ratios else None

    # Phase-attributed ratios: the q_*_refresh queries split their timing
    # into `<q>.seed` (O(N) harness setup) and `<q>.refresh` (the
    # O(trailing-window) operator under test). The refresh-only ratio is
    # the number that can actually see a refresh regression — the whole-
    # query ratio is dominated by the seed's O(N).
    p1, p10 = b1.get("phases", {}), b10.get("phases", {})
    phase_ratios = {k: {"sf01_sec": round(p1[k], 3),
                        "scale_sec": round(p10[k], 3),
                        "ratio": round(p10[k] / p1[k], 2)}
                    for k in p1 if k in p10 and p1[k] > 0 and p10[k] >= 0}
    refresh_only = {k: v for k, v in phase_ratios.items()
                    if k.endswith(".refresh")}
    artifact = {
        "corpus": corpus,
        "scale_factor_vs_sf01": 10,
        "reps": reps,
        "stat": f"min_of_{reps}",
        "correctness_at_scale": correctness,
        # io_calibration_sec: the fixed-work parquet write+read anchor —
        # a cross-round swing in these ratios that tracks the anchor is
        # environment, one that doesn't is code (same attribution contract
        # as BENCH_FULL; the r14 "regression" burned a round without it)
        "sf01": {"total_sec": b1["value"],
                 "calibration_sec": b1["calibration_sec"],
                 "io_calibration_sec": b1.get("io_calibration_sec"),
                 "total_per_calib": b1["total_per_calib"],
                 "pit_warm": b1["pit_warm"], "online_warm": b1["online_warm"]},
        "scale": {"total_sec": b10["value"],
                  "calibration_sec": b10["calibration_sec"],
                  "io_calibration_sec": b10.get("io_calibration_sec"),
                  "total_per_calib": b10["total_per_calib"],
                  "pit_warm": b10["pit_warm"],
                  "online_warm": b10["online_warm"]},
        "wall_ratio_for_10x_data": round(
            b10["total_per_calib"] / b1["total_per_calib"], 2),
        "median_query_ratio": med,
        "worst_query_ratios": worst,
        "refresh_only_ratios": refresh_only,
        "phase_ratios": phase_ratios,
        "n_queries": len(ratios),
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ["wall_ratio_for_10x_data", "median_query_ratio",
                       "refresh_only_ratios",
                       "correctness_at_scale", "n_queries"]}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
