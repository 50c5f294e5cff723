package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.Decoders
import graft.parsers.{ParserDef, Parsers, RegexFormat}

/** Kubernetes-style metadata enrichment (reference
  * `plugins/filter_kubernetes/`): extract `(pod_name, namespace,
  * container_name, docker_id)` from the TAG via the kube regex
  * (`kube_regex.h:26`, applied `kube_meta.c:539-546`), look the pod up in a
  * metadata cache and merge the result under a `kubernetes` sub-map
  * (`kubernetes.c:338-384`).
  *
  * Spark-first restatement: the reference's LRU hash cache over the K8s API
  * (`kube_meta.c:760-781`) IS a broadcast hash join — the dimension table
  * (pod metadata) is small, so `broadcast(dim)` replicates it to every
  * executor exactly like the per-process cache, with zero shuffle of the
  * fact stream.
  */
object Enrich {

  /** Tag-metadata struct (null for non-kube tags). */
  def kubeMeta(tag: Column): Column = Parsers.kubeTag.parsed(tag)

  /** Enrich `df` with pod metadata.
    *
    * @param dim dimension table keyed `pod_key = "<pod_name>_<namespace>"`,
    *            carrying `labels`/`annotations` maps (FIXTURES §6).
    *            An annotation `fluentbit.io/exclude = "true"` drops the row
    *            post-join (reference `kube_property.c`, applied
    *            `kubernetes.c:425-434`).
    */
  def kubernetes(df: DataFrame, tagCol: String, dim: DataFrame,
                 applyExclude: Boolean = true): DataFrame = {
    // metadata payload = every dim column except the join key
    val metaCols = dim.columns.filterNot(_ == "pod_key").toSeq
    val meta = kubeMeta(col(tagCol))
    val withKey = df
      .withColumn("_kmeta", meta)
      .withColumn("pod_key",
        when(col("_kmeta").isNotNull,
          concat(col("_kmeta.pod_name"), lit("_"), col("_kmeta.namespace_name"))))
    val joined = withKey
      .join(broadcast(dim), Seq("pod_key"), "left")
      .withColumn("kubernetes",
        when(col("_kmeta").isNotNull, struct(
          Seq(
            col("_kmeta.pod_name").as("pod_name"),
            col("_kmeta.namespace_name").as("namespace_name"),
            col("_kmeta.container_name").as("container_name"),
            col("_kmeta.docker_id").as("docker_id")) ++ metaCols.map(col): _*)))
      .drop("_kmeta" +: metaCols: _*)
    if (applyExclude && metaCols.contains("annotations"))
      joined.filter(
        coalesce(element_at(col("kubernetes.annotations"), "fluentbit.io/exclude"), lit("false")) =!= "true")
    else joined
  }

  /** `Merge_Log` (reference `kubernetes.c:67-147,183-336`): unescape the
    * container `log` string, JSON-parse it, and splice its keys into the
    * record — either as top-level columns (flattened) or under
    * `Merge_JSON_Key`. A log line that is not JSON leaves the record
    * unchanged (null parsed fields / null sub-struct).
    */
  def mergeLog(df: DataFrame, logCol: String, schema: StructType,
               mergeJsonKey: Option[String] = None): DataFrame = {
    val parsed = from_json(Decoders.escaped(col(logCol)), schema)
    mergeJsonKey match {
      case Some(k) => df.withColumn(k, parsed)
      case None =>
        schema.fieldNames.foldLeft(df.withColumn("_ml", parsed))(
          (d, f) => d.withColumn(f, col("_ml").getField(f))).drop("_ml")
    }
  }

  /** Per-pod parser via the `fluentbit.io/parser` annotation
    * (reference `kube_property.c`, applied `kubernetes.c:425-434`): rows
    * whose pod metadata names a parser get that parser applied to
    * `rawCol`; the result is a `map<string,string>` record column (the
    * union carrier across differently-shaped parsers). Unannotated or
    * unknown-parser rows get null.
    */
  def annotationParser(df: DataFrame, rawCol: String,
                       parsers: Map[String, ParserDef],
                       annotationsCol: String = "kubernetes.annotations"): DataFrame = {
    val pname = element_at(col(annotationsCol), "fluentbit.io/parser")
    val parsed = parsers.foldRight(lit(null).cast("map<string,string>")) {
      case ((name, p), rest) =>
        val names = p.format match {
          case RegexFormat => p.groupNames.filter(g => p.timeKeep || !p.timeKey.contains(g))
          case _           => p.jsonSchema.get.fieldNames.toSeq
        }
        val st = p.parsed(col(rawCol))
        val asMap = map(names.flatMap(n => Seq(lit(n), st.getField(n).cast("string"))): _*)
        when(pname === name, when(st.isNotNull, asMap)).otherwise(rest)
    }
    df.withColumn("parsed_by_annotation", parsed)
  }
}
