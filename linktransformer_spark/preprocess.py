"""Training-side preprocessing as DataFrame transforms (SURVEY §2.6).

Mirrors /root/reference/src/linktransformer/preprocess.py:
- ``check_and_prep_data``  (preprocess.py:65-162): validate columns,
  drop all-null key rows / any-null id rows, dedup on left+right key
  cols, dense group ids with "_l"/"_r" suffixes, serialize multi-col
  keys into left_text/right_text.
- ``check_clust_data``     (preprocess.py:17-60): same for
  (text, cluster-id) data; "_g" suffix.
- ``prep_linkage_data``    (preprocess.py:438-623): edges from
  (left_id, right_id) -> connected components -> cluster_assignment;
  CLUSTER-level train/val/test split; train dict {cluster: texts} and
  IR eval structures (queries / corpus / relevant_docs) — here three
  DataFrames instead of dicts; ``large_val`` adds train rows to the
  corpus with "_train"-suffixed ids (preprocess.py:598-604).
- ``prep_paired_label_data`` (preprocess.py:264-434): ROW-level split;
  positives-only edge list -> components -> train clusters; val/test
  as (left_text, right_text, label) pair tables.

Engine semantics where the reference is nondeterministic (SURVEY §1.3):
- dense group ids = dense_rank over sorted keys (pandas
  ``groupby(...).ngroup()`` numbers groups in sorted-key order, so the
  two agree exactly);
- component label = MIN encoded node id in the component (the reference
  uses arbitrary networkx ordering; label VALUES differ, partitions are
  identical). Left group g encodes to node 2g, right group g to 2g+1.
- splits: sklearn ``train_test_split(random_state=42)`` cannot be
  reproduced bit-for-bit cross-library (SURVEY §7 hard-part 4); we
  define a deterministic hash split — bucket = poly_hash(unit) % 1000,
  train gets buckets [0, 1000*(1-val_perc)), val/test split the rest
  (val first half, test second). Unit = cluster id (linkage) or the
  pair key (paired). Protocol parity: seeded, unit-level, proportional.

All outputs are DataFrames; "dicts" become two-column tables. Every
step is a shuffle-free map, a groupBy, or the O(log^2 n) component
rounds — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .functions.serialize import DEFAULT_SEP, serialize_columns
from .functions.similarity import poly_hash
from .operators.components import connected_components

SPLIT_BUCKETS = 1000


def _as_list(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def _require_cols(df: DataFrame, cols: list[str], what: str) -> None:
    for c in cols:
        if c not in df.columns:
            raise ValueError(
                f"Column {c} not present in data, please check the {what} column names"
            )


def _dense_group_id(df: DataFrame, key_cols: list[str], out: str, suffix: str) -> DataFrame:
    """pandas ``groupby(key).ngroup().astype(str) + suffix``: group
    number = rank of the key in sorted order (pandas sort=True default).

    Ranks only the DISTINCT key projection (small), then joins back —
    the global sort touches |distinct keys| rows, not the dataset.
    """
    keys = df.select(*key_cols).distinct()
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in key_cols])
    ranked = keys.withColumn(
        out, F.concat((F.dense_rank().over(w) - 1).cast("string"), F.lit(suffix))
    )
    # null-safe join back (text cols used as keys may contain nulls)
    cond = None
    for c in key_cols:
        ranked = ranked.withColumnRenamed(c, f"_k_{c}")
        eq = F.col(c).eqNullSafe(F.col(f"_k_{c}"))
        cond = eq if cond is None else cond & eq
    return df.join(ranked, cond, "left").drop(*[f"_k_{c}" for c in key_cols])


def check_and_prep_data(
    df: DataFrame,
    left_col_names,
    right_col_names,
    left_id_name=None,
    right_id_name=None,
    label_col_name: str | None = None,
    sep: str = DEFAULT_SEP,
) -> DataFrame:
    """Validate/clean/normalize paired linkage data
    (reference preprocess.py:65-162). Adds ``left_id``, ``right_id``,
    ``left_text``, ``right_text``."""
    left_cols = _as_list(left_col_names)
    right_cols = _as_list(right_col_names)
    left_ids = _as_list(left_id_name)
    right_ids = _as_list(right_id_name)

    _require_cols(df, left_cols, "left")
    _require_cols(df, right_cols, "right")
    if label_col_name:
        _require_cols(df, [label_col_name], "label")
    _require_cols(df, left_ids, "left id")
    _require_cols(df, right_ids, "right id")

    # drop rows where ALL left (or all right) key cols are null
    if left_cols:
        df = df.filter(F.coalesce(*[F.col(c).cast("string") for c in left_cols], F.lit(None)).isNotNull())
    if right_cols:
        df = df.filter(F.coalesce(*[F.col(c).cast("string") for c in right_cols], F.lit(None)).isNotNull())
    # drop rows where ANY id col is null
    for c in left_ids + right_ids:
        df = df.filter(F.col(c).isNotNull())

    # dedup on left+right key cols (v0.1.12 semantics, preprocess.py:119).
    # pandas keeps the first row in input order; Spark has no input order,
    # so the survivor among exact-key duplicates is arbitrary — key-derived
    # outputs (ids/texts) are unaffected.
    df = df.dropDuplicates(left_cols + right_cols)

    df = _dense_group_id(df, left_ids or left_cols, "left_id", "_l")
    df = _dense_group_id(df, right_ids or right_cols, "right_id", "_r")

    df = df.withColumn(
        "left_text",
        serialize_columns(left_cols, sep) if len(left_cols) > 1 else F.col(left_cols[0]).cast("string"),
    )
    df = df.withColumn(
        "right_text",
        serialize_columns(right_cols, sep) if len(right_cols) > 1 else F.col(right_cols[0]).cast("string"),
    )
    if label_col_name and label_col_name != "label":
        df = df.withColumnRenamed(label_col_name, "label")
    return df


def check_clust_data(
    df: DataFrame,
    text_col_names,
    clus_id_col_name,
    sep: str = DEFAULT_SEP,
) -> DataFrame:
    """(text, cluster-id) variant (reference preprocess.py:17-60).
    Adds ``cluster_assignment`` ("<n>_g") and ``text``."""
    text_cols = _as_list(text_col_names)
    id_cols = _as_list(clus_id_col_name)
    _require_cols(df, text_cols, "text")
    _require_cols(df, id_cols, "cluster id")

    df = df.filter(F.coalesce(*[F.col(c).cast("string") for c in text_cols], F.lit(None)).isNotNull())
    for c in id_cols:
        df = df.filter(F.col(c).isNotNull())
    df = _dense_group_id(df, id_cols, "cluster_assignment", "_g")
    return df.withColumn(
        "text",
        serialize_columns(text_cols, sep) if len(text_cols) > 1 else F.col(text_cols[0]).cast("string"),
    )


def _node_ids(df: DataFrame) -> DataFrame:
    """Encode string group ids 'g_l'/'g_r' as longs 2g / 2g+1."""
    g_l = F.split(F.col("left_id"), "_").getItem(0).cast("long")
    g_r = F.split(F.col("right_id"), "_").getItem(0).cast("long")
    return df.withColumn("_node_l", g_l * 2).withColumn("_node_r", g_r * 2 + 1)


def _with_components(df: DataFrame) -> DataFrame:
    """cluster_assignment = min encoded node id of the (left_id,
    right_id) edge's component."""
    df = _node_ids(df)
    comp = connected_components(
        df.select(F.col("_node_l").alias("src"), F.col("_node_r").alias("dst"))
    )
    out = df.join(
        comp.withColumnRenamed("node", "_node_l").withColumnRenamed(
            "component", "cluster_assignment"
        ),
        "_node_l",
        "left",
    )
    # an isolated row (its edge was its whole component) may drop out of
    # the star output only if src==dst after encoding — impossible here
    # (even vs odd), so cluster_assignment is always present; coalesce
    # defensively to the left node id.
    return out.withColumn(
        "cluster_assignment", F.coalesce("cluster_assignment", F.col("_node_l"))
    ).drop("_node_l", "_node_r")


def _split_bucket(unit: Column) -> Column:
    return poly_hash(unit.cast("string"), 7) % SPLIT_BUCKETS


def split_assign(unit: Column, val_perc: float, test_at_end: bool) -> Column:
    """'train' / 'val' / 'test' by deterministic hash bucket of ``unit``."""
    cut = int(round(SPLIT_BUCKETS * (1.0 - val_perc)))
    b = _split_bucket(unit)
    if not test_at_end:
        return F.when(b < cut, "train").otherwise("val")
    mid = cut + (SPLIT_BUCKETS - cut) // 2
    return (
        F.when(b < cut, "train").when(b < mid, "val").otherwise("test")
    )


def _train_clusters(train: DataFrame) -> DataFrame:
    """{cluster: deduped texts} as (cluster_assignment, text) rows
    (reference preprocess.py:581-587 builds the same set-valued dict)."""
    return (
        train.select("cluster_assignment", F.col("left_text").alias("text"))
        .unionByName(train.select("cluster_assignment", F.col("right_text").alias("text")))
        .distinct()
    )


def prep_linkage_data(
    df: DataFrame,
    left_col_names,
    right_col_names,
    left_id_name=None,
    right_id_name=None,
    val_perc: float = 0.2,
    large_val: bool = True,
    test_at_end: bool = True,
    sep: str = DEFAULT_SEP,
) -> dict[str, DataFrame]:
    """Linkage training prep (reference preprocess.py:438-623).

    Returns DataFrames:
      train_clusters            (cluster_assignment, text)
      val_queries/test_queries  (qid, text)
      val_corpus/test_corpus    (cid, text)
      val_relevant/test_relevant (qid, cid)
    """
    data = check_and_prep_data(
        df, left_col_names, right_col_names, left_id_name, right_id_name, None, sep
    )
    data = _with_components(data)

    if val_perc == 1:
        train = val = data
        test = data.limit(0)
    else:
        data = data.withColumn(
            "_split", split_assign(F.col("cluster_assignment"), val_perc, test_at_end)
        )
        train = data.filter(F.col("_split") == "train")
        val = data.filter(F.col("_split") == "val")
        test = data.filter(F.col("_split") == "test")

    def ir_tables(part: DataFrame, tag: str) -> dict[str, DataFrame]:
        queries = part.select(F.col("left_id").alias("qid"), F.col("left_text").alias("text")).distinct()
        corpus = part.select(F.col("right_id").alias("cid"), F.col("right_text").alias("text")).distinct()
        relevant = part.select(F.col("left_id").alias("qid"), F.col("right_id").alias("cid")).distinct()
        return {f"{tag}_queries": queries, f"{tag}_corpus": corpus, f"{tag}_relevant": relevant}

    out = {"train_clusters": _train_clusters(train)}
    val_tables = ir_tables(val, "val")
    if large_val:
        # training rows join the val corpus under "_train"-suffixed ids
        # (preprocess.py:598-604)
        extra_corpus = train.select(
            F.concat(F.col("right_id"), F.lit("_train")).alias("cid"),
            F.col("right_text").alias("text"),
        ).distinct()
        extra_rel = train.select(
            F.concat(F.col("left_id"), F.lit("_train")).alias("qid"),
            F.concat(F.col("right_id"), F.lit("_train")).alias("cid"),
        ).distinct()
        val_tables["val_corpus"] = val_tables["val_corpus"].unionByName(extra_corpus)
        val_tables["val_relevant"] = val_tables["val_relevant"].unionByName(extra_rel)
    out.update(val_tables)
    out.update(ir_tables(test, "test"))
    return out


def prep_paired_label_data(
    df: DataFrame,
    left_col_names,
    right_col_names,
    left_id_name=None,
    right_id_name=None,
    label_col_name: str = "label",
    val_perc: float = 0.2,
    test_at_end: bool = True,
    pairs_for_training: bool = False,
    sep: str = DEFAULT_SEP,
) -> dict[str, DataFrame]:
    """Paired-label training prep (reference preprocess.py:264-434).

    Returns DataFrames:
      train_clusters  (cluster_assignment, text)   [pairs_for_training=False]
      train_pairs     (left_text, right_text, label) [pairs_for_training=True]
      val_pairs/test_pairs (left_text, right_text, label)
    """
    data = check_and_prep_data(
        df, left_col_names, right_col_names, left_id_name, right_id_name,
        label_col_name, sep,
    )
    # ROW-level split for paired data (preprocess.py:370-374); unit =
    # the (left_id, right_id) pair key.
    unit = F.concat_ws("|", "left_id", "right_id")
    if val_perc == 1:
        train = val = data
        test = data.limit(0)
    else:
        data = data.withColumn("_split", split_assign(unit, val_perc, test_at_end))
        train = data.filter(F.col("_split") == "train")
        val = data.filter(F.col("_split") == "val")
        test = data.filter(F.col("_split") == "test")

    out: dict[str, DataFrame] = {}
    if pairs_for_training:
        out["train_pairs"] = train.select("left_text", "right_text", "label")
    else:
        positives = _with_components(train.filter(F.col("label") == 1))
        out["train_clusters"] = _train_clusters(positives)

    out["val_pairs"] = val.select("left_text", "right_text", "label")
    out["test_pairs"] = test.select("left_text", "right_text", "label")
    return out


def preprocess_any_data(
    df: DataFrame,
    left_col_names=None,
    right_col_names=None,
    left_id_name=None,
    right_id_name=None,
    label_col_name: str | None = None,
    clus_id_col_name: str | None = None,
    clus_text_col_names=None,
    val_perc: float = 0.2,
    val_query_prop: float = 0.5,
    large_val: bool = True,
    test_at_end: bool = True,
    pairs_for_training: bool = False,
    sep: str = DEFAULT_SEP,
) -> dict[str, DataFrame]:
    """Dispatcher over the three training-prep paths (reference
    preprocess.py:166-259): a label column routes to
    ``prep_paired_label_data``, cluster id+text columns to
    ``prep_clus_data``, anything else to ``prep_linkage_data`` — with
    the reference's mutual-exclusion validation (preprocess.py:203-210).
    """
    if label_col_name and clus_id_col_name:
        raise ValueError(
            "Please specify either label_col_name or clusterid_col_name. Not both"
        )
    if label_col_name and clus_text_col_names:
        raise ValueError(
            "Please specify either label_col_name or cluster_text_col_name. Not both"
        )
    if clus_id_col_name and not clus_text_col_names:
        raise ValueError(
            "Please specify cluster_text_col_name if you specify clusterid_col_name"
        )
    if clus_text_col_names and not clus_id_col_name:
        raise ValueError(
            "Please specify clusterid_col_name if you specify cluster_text_col_name"
        )

    if label_col_name:
        return prep_paired_label_data(
            df,
            left_col_names,
            right_col_names,
            left_id_name=left_id_name,
            right_id_name=right_id_name,
            label_col_name=label_col_name,
            val_perc=val_perc,
            test_at_end=test_at_end,
            pairs_for_training=pairs_for_training,
            sep=sep,
        )
    if clus_id_col_name and clus_text_col_names:
        return prep_clus_data(
            df,
            clus_text_col_names,
            clus_id_col_name,
            val_perc=val_perc,
            val_query_prop=val_query_prop,
            large_val=large_val,
            test_at_end=test_at_end,
            sep=sep,
        )
    return prep_linkage_data(
        df,
        left_col_names,
        right_col_names,
        left_id_name=left_id_name,
        right_id_name=right_id_name,
        val_perc=val_perc,
        large_val=large_val,
        test_at_end=test_at_end,
        sep=sep,
    )


def edges_from_clusters(df: DataFrame, node_col: str, cluster_col: str) -> DataFrame:
    """All intra-cluster pairs (reference cluster_fns.py:96-106):
    self-join on the cluster id with l.node < r.node."""
    l = df.select(F.col(cluster_col).alias("_c"), F.col(node_col).alias("src"))
    r = df.select(F.col(cluster_col).alias("_c"), F.col(node_col).alias("dst"))
    return l.join(r, "_c").filter(F.col("src") < F.col("dst")).select("src", "dst")


def prep_clus_data(
    df: DataFrame,
    text_col_names,
    clus_id_col_name,
    val_perc: float = 0.2,
    val_query_prop: float = 0.5,
    large_val: bool = True,
    test_at_end: bool = True,
    sep: str = DEFAULT_SEP,
) -> dict[str, DataFrame]:
    """Cluster-data training prep (reference preprocess.py:654-845).

    Split is CLUSTER-level; within each val/test cluster the first
    ``floor(n * val_query_prop)`` rows become queries (ids
    ``<cluster><i>``) and the rest corpus (ids ``<cluster><i>c``,
    i = 0-based position within its part); every query of a cluster is
    relevant to ALL of that cluster's corpus docs. ``large_val`` adds
    train rows to the corpus under ``<cluster><i>ct`` ids
    (preprocess.py:799-808).

    Engine determinism: the reference's "first rows of the group" uses
    pandas input order; here rows order by text within the cluster.
    """
    data = check_clust_data(df, text_col_names, clus_id_col_name, sep)

    if val_perc == 1:
        train = val = data
        test = data.limit(0)
    else:
        data = data.withColumn(
            "_split", split_assign(F.col("cluster_assignment"), val_perc, test_at_end)
        )
        train = data.filter(F.col("_split") == "train")
        val = data.filter(F.col("_split") == "val")
        test = data.filter(F.col("_split") == "test")

    out = {
        "train_clusters": train.select("cluster_assignment", "text").distinct(),
    }

    def ir_tables(part: DataFrame, tag: str) -> dict[str, DataFrame]:
        w = Window.partitionBy("cluster_assignment").orderBy("text")
        wc = Window.partitionBy("cluster_assignment")
        g = (
            part.withColumn("_rn", F.row_number().over(w) - 1)
            .withColumn("_n", F.count(F.lit(1)).over(wc))
            .withColumn("_qcut", F.floor(F.col("_n") * F.lit(val_query_prop)))
        )
        queries = g.filter(F.col("_rn") < F.col("_qcut")).select(
            F.concat("cluster_assignment", F.col("_rn").cast("string")).alias("qid"),
            "text",
            F.col("cluster_assignment").alias("_c"),
        )
        corpus = g.filter(F.col("_rn") >= F.col("_qcut")).select(
            F.concat(
                "cluster_assignment",
                (F.col("_rn") - F.col("_qcut")).cast("string"),
                F.lit("c"),
            ).alias("cid"),
            "text",
            F.col("cluster_assignment").alias("_c"),
        )
        relevant = queries.select("qid", "_c").join(
            corpus.select("cid", "_c"), "_c"
        ).select("qid", "cid")
        return {
            f"{tag}_queries": queries.drop("_c"),
            f"{tag}_corpus": corpus.drop("_c"),
            f"{tag}_relevant": relevant,
        }

    val_tables = ir_tables(val, "val")
    if large_val:
        w = Window.partitionBy("cluster_assignment").orderBy("text")
        extra = train.withColumn("_rn", F.row_number().over(w) - 1).select(
            F.concat(
                "cluster_assignment", F.col("_rn").cast("string"), F.lit("ct")
            ).alias("cid"),
            "text",
        )
        val_tables["val_corpus"] = val_tables["val_corpus"].unionByName(extra)
    out.update(val_tables)
    out.update(ir_tables(test, "test"))
    return out
