package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * The streamed≡batch key-type contract (r19): the streaming twins
 * key their state stores on `cast("long")` ids, while the batch
 * operators accept any key type. A non-integral key (a string user
 * id, a UUID) would cast to NULL, silently merging every such key
 * into one state row — a divergence the parity pins can only catch
 * if the test data happens to contain one. So the twins REFUSE
 * non-integral key columns up front; callers with string ids hash or
 * dictionary-encode them upstream (exactly what a production event
 * pipeline does before a stateful shuffle anyway).
 */
private[streaming] object StreamingKeys {
  def requireIntegral(op: String, df: DataFrame, keyCol: String): Unit = {
    val dt = df.schema(keyCol).dataType
    require(org.apache.spark.sql.graftbridge.ColumnBridge.isIntegral(dt),
      s"$op: key column $keyCol must be integral (got " +
        s"${dt.simpleString}) — the state store keys on a long cast, " +
        "and a non-integral key would cast to null and silently merge " +
        "keys; hash or dictionary-encode ids upstream")
  }
}
