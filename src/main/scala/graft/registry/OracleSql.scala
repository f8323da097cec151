package graft.registry

/** Shared DuckDB SQL fragments for the correctness oracle. Every fragment
  * mirrors the Spark-side column arithmetic bit-for-bit (same operator tree,
  * doubles forced via CAST so DuckDB's decimal literals don't change results).
  */
object OracleSql {

  /** The `trades` view over `events` — must stay in lockstep with
    * [[graft.core.Tables.trades]].
    */
  val tradesCte: String =
    """trades AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS time,
      |         CAST(user_id AS VARCHAR) AS symbol,
      |         value AS price,
      |         CAST(1 + event_id % 100 AS DOUBLE) AS volume,
      |         CAST(event_id AS VARCHAR) AS trade_id,
      |         CASE WHEN event_type = 'purchase' THEN 'buy'
      |              WHEN event_type = 'click' THEN 'sell' END AS side,
      |         CASE WHEN event_id % 7 <> 0
      |              THEN value - (1 + event_id % 10) / CAST(100 AS DOUBLE) END AS bid,
      |         CASE WHEN event_id % 11 <> 0
      |              THEN value + (1 + event_id % 10) / CAST(100 AS DOUBLE) END AS ask
      |  FROM events)""".stripMargin

  def withTrades(sql: String): String = s"WITH $tradesCte\n$sql"

  def withTradesAnd(extraCtes: String, sql: String): String =
    s"WITH $tradesCte,\n$extraCtes\n$sql"
}
