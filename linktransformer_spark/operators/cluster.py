"""cluster_rows / dedup_rows (SURVEY §2.2 ops 8-9).

Reference semantics (/root/reference/src/linktransformer/infer.py:377-485,
cluster_fns.py:7-78): embed `on`, L2-normalize, cluster, append a
``cluster`` label column; dedup = exact-dup drop, cluster, keep first
row per cluster.

Cluster types:
- "SLINK" (default): DBSCAN(eps=threshold, min_samples="min cluster
  size", metric=cosine). For min_samples <= 2 this is EXACTLY the
  connected components of the ε-similarity graph (SURVEY §7 hard-part
  3), which we compute distributively (operators/components.py). For
  min_samples > 2 we apply the core/border rule: core nodes have
  >= min_samples-1 neighbors, clusters = CC over core-core edges,
  border nodes attach to their minimum-labeled adjacent core cluster
  (sklearn attaches to the first-discovered one — order-dependent; we
  define the deterministic rule and document the deviation).
- "agglomerative" / "HDBScan": numpy reimplementations (Lance-Williams
  / HDBSCAN* + excess-of-mass) run per BLOCK as one applyInPandas task
  each — with ``block_on`` that is the scale path, without it the
  reference's whole-table semantics in a single bounded task. When the
  real hdbscan package is importable (not in this container) HDBScan
  delegates to it driver-local for reference-exact extraction.

Label values: component-min row id (long), noise = -1. The reference's
sklearn labels are discovery-ordered ints — the PARTITION is the
contract, not the label values (SURVEY §1.3).

dedup_rows deviation (documented): the reference keeps only the FIRST
noise row because drop_duplicates(subset="cluster") treats the shared
-1 label as one cluster (infer.py:481-482) — silently discarding unique
rows. We keep every noise row (each is its own singleton cluster);
`reference_noise_compat=True` restores the reference behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..functions.serialize import DEFAULT_SEP, serialize_columns
from ..ids import LT_ID, check_reserved, min_id_first, with_row_id
from .components import connected_components
from .knn_join import resolve_scorer

DEFAULT_PARAMS = {
    "SLINK": {"min cluster size": 2, "threshold": 0.1, "metric": "cosine"},
    "agglomerative": {"threshold": 0.5, "clustering linkage": "ward", "metric": "euclidean"},
    "HDBScan": {"min cluster size": 5, "min samples": 1, "metric": "cosine"},
}


def _epsilon_edges(
    df: DataFrame,
    key_col: str,
    scorer,
    sim_threshold: float,
    id_col: str = LT_ID,
    mode: str = "exact_cross",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs (i, j), i != j, similarity >= sim_threshold.
    exact mode = self cross-join with i < j then mirrored; lsh mode
    prefilters candidates (the 100 TB path). ``block_cols`` restricts
    pairs to equal block values — the cross join becomes an equi-join
    on the block key (blocking IS partition pruning, SURVEY §4)."""
    from . import knn_join as KJ

    bl = [(f"_lt_bl{i}_l", f"_lt_bl{i}_r") for i in range(len(block_cols or []))]
    l = df.select(
        F.col(id_col).alias(KJ.LEFT_ID),
        F.col(key_col).alias(KJ.LEFT_KEY),
        *([F.col("_lt_emb").alias(KJ.LEFT_EMB)] if scorer.needs_embeddings else []),
        *[F.col(c).alias(a) for c, (a, _) in zip(block_cols or [], bl)],
    )
    r = df.select(
        F.col(id_col).alias(KJ.RIGHT_ID),
        F.col(key_col).alias(KJ.RIGHT_KEY),
        *([F.col("_lt_emb").alias(KJ.RIGHT_EMB)] if scorer.needs_embeddings else []),
        *[F.col(c).alias(a) for c, (_, a) in zip(block_cols or [], bl)],
    )
    cand = KJ.candidate_scores(
        l, r, scorer, mode=mode, threshold=sim_threshold,
        block_on=bl if bl else None,
    )
    pairs = cand.filter(F.col(KJ.LEFT_ID) < F.col(KJ.RIGHT_ID)).select(
        F.col(KJ.LEFT_ID).alias("src"), F.col(KJ.RIGHT_ID).alias("dst")
    )
    return pairs


def cluster_rows(
    df: DataFrame,
    model=None,
    on=None,
    cluster_type: str = "SLINK",
    cluster_params: dict | None = None,
    id_col: str | None = None,
    deterministic_ids: bool = True,
    mode: str = "exact_cross",
    cluster_col: str = "cluster",
    block_on: list[str] | None = None,
) -> DataFrame:
    """Append a ``cluster`` label column (see module doc).

    ``block_on``: cluster within blocks of equal values of these
    columns. For SLINK the ε-similarity graph is restricted to
    same-block pairs (the cross join becomes a block equi-join); for
    agglomerative / HDBScan it is one applyInPandas task per block —
    in all cases the scale path."""
    if cluster_type not in DEFAULT_PARAMS:
        raise ValueError('cluster_type must be "agglomerative", "HDBScan", or "SLINK"')
    if on is None:
        raise ValueError("on= is required for cluster_rows")
    if block_on:
        missing = [c for c in block_on if c not in df.columns]
        if missing:
            raise ValueError(f"block_on columns {missing} not in DataFrame")
    params = dict(DEFAULT_PARAMS[cluster_type])
    params.update(cluster_params or {})
    check_reserved(df)

    if cluster_type in ("agglomerative", "HDBScan") and not block_on:
        # the documented small-data cliff, made LOUD: one global block
        # = one O(n^2) Arrow task. Counted on the INPUT df (same row
        # count as the post-encode frame) so join-based encoders don't
        # run their embed stage — including paid API calls — twice.
        n = df.count()
        if n > 20_000:
            import warnings

            warnings.warn(
                f"cluster_rows(block_on=None) runs {cluster_type} as a "
                f"SINGLE O(n^2) task over {n} rows (reference-exact "
                "whole-table semantics). Pass block_on=[...] for the "
                "per-block scale path.",
                RuntimeWarning,
                stacklevel=2,
            )

    from .knn_join import ensure_parallelism

    work = with_row_id(ensure_parallelism(df), id_col=id_col, deterministic=deterministic_ids)
    work = work.withColumn("_lt_key", serialize_columns(on, DEFAULT_SEP))
    scorer = resolve_scorer(model)
    if scorer.needs_embeddings:
        enc = scorer.encoder
        work = (
            enc.encode(work, "_lt_key", "_lt_emb")
            if enc.expression_based
            else enc.encode_distinct(work, "_lt_key", "_lt_emb")
        )

    if cluster_type in ("agglomerative", "HDBScan"):
        out = _sklearn_cluster(
            work, df.columns, cluster_type, params, cluster_col, block_on=block_on
        )
        return out.select(*df.columns, cluster_col, "_lt_cluster_row_id")

    # ---- SLINK / DBSCAN ----
    eps = float(params["threshold"])
    min_samples = int(params["min cluster size"])
    sim_t = 1.0 - eps  # cosine distance eps -> similarity threshold
    work = work.localCheckpoint(eager=False)  # edges + join reuse the scan
    edges = _epsilon_edges(
        work, "_lt_key", scorer, sim_t, mode=mode, block_cols=block_on
    )

    if min_samples <= 2:
        comp = connected_components(edges)
    else:
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = und.groupBy("src").agg(F.countDistinct("dst").alias("_deg"))
        core = deg.filter(F.col("_deg") >= min_samples - 1).select(
            F.col("src").alias("node")
        )
        core_edges = (
            und.join(core.withColumnRenamed("node", "src"), "src")
            .join(core.select(F.col("node").alias("dst")), "dst")
            .select("src", "dst")
        )
        core_comp = connected_components(core_edges)
        # isolated cores (no core neighbor but enough border neighbors)
        lone_core = core.join(core_comp, core["node"] == core_comp["node"], "left_anti")
        core_comp = core_comp.unionByName(lone_core.withColumn("component", F.col("node")))
        # border nodes: adjacent to a core -> min adjacent core component
        border = (
            und.join(core_comp.withColumnRenamed("node", "dst"), "dst")
            .join(core.withColumnRenamed("node", "src"), "src", "left_anti")
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .select(F.col("src").alias("node"), "component")
        )
        comp = core_comp.unionByName(border)

    out = work.join(
        comp.withColumnRenamed("node", LT_ID).withColumnRenamed("component", cluster_col),
        LT_ID,
        "left",
    )
    # isolated rows = DBSCAN noise = -1
    out = out.withColumn(cluster_col, F.coalesce(F.col(cluster_col), F.lit(-1)).cast("long"))
    return out.select(*df.columns, cluster_col, LT_ID).withColumnRenamed(LT_ID, "_lt_cluster_row_id")


def _numpy_agglomerative(X, threshold: float, linkage: str = "ward",
                         metric: str = "euclidean"):
    """Hierarchical agglomerative clustering via Lance-Williams updates
    — the algorithm behind the reference's
    sklearn.AgglomerativeClustering(n_clusters=None, distance_threshold)
    (/root/reference/src/linktransformer/cluster_fns.py:52-58),
    reimplemented on numpy so the engine needs no sklearn.

    Merges the closest pair while its linkage distance is < threshold
    (sklearn's distance_threshold contract: clusters at or above the
    threshold are not merged). Tie-break: lowest (i, j) index pair —
    sklearn's is insertion-order dependent; the PARTITION is the
    contract (SURVEY §1.3), and ties at identical float distances are
    the only divergence. Returns an int array of cluster ids (values =
    lowest member index).
    """
    import numpy as np

    n = len(X)
    if n == 0:
        return np.empty(0, dtype="int64")
    X = np.asarray(X, dtype="float64")
    if metric == "cosine":
        norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        D = 1.0 - (X / norms) @ (X / norms).T
        np.fill_diagonal(D, 0.0)
    elif metric == "euclidean":
        sq = (X * X).sum(axis=1)
        D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0))
    else:
        raise ValueError(f"metric {metric!r} not supported (euclidean|cosine)")
    if linkage not in ("ward", "single", "complete", "average"):
        raise ValueError(f"linkage {linkage!r} not supported")

    alive = np.ones(n, dtype=bool)
    size = np.ones(n, dtype="float64")
    label = np.arange(n, dtype="int64")  # representative = lowest member index
    INF = np.inf
    work = D.copy()
    np.fill_diagonal(work, INF)

    while alive.sum() > 1:
        # dead rows/cols are INF, so the full-matrix argmin finds the
        # same (first-in-row-major ⇒ lowest (i, j)) alive pair as an
        # alive-submatrix argmin would — without copying an O(n²)
        # submatrix per merge (that copy dominated large single-block
        # runs)
        flat = int(np.argmin(work))
        i, j = divmod(flat, n)
        d_ij = work[i, j]
        if not (d_ij < threshold):
            break
        if i > j:
            i, j = j, i
        # Lance-Williams distance of every alive k to the merged (i∪j)
        sub = np.where(alive)[0]
        k = sub[(sub != i) & (sub != j)]
        d_ki, d_kj = work[k, i], work[k, j]
        if linkage == "single":
            new = np.minimum(d_ki, d_kj)
        elif linkage == "complete":
            new = np.maximum(d_ki, d_kj)
        elif linkage == "average":
            new = (size[i] * d_ki + size[j] * d_kj) / (size[i] + size[j])
        else:  # ward
            nk, ni, nj = size[k], size[i], size[j]
            tot = nk + ni + nj
            new = np.sqrt(
                np.maximum(
                    ((nk + ni) * d_ki**2 + (nk + nj) * d_kj**2 - nk * d_ij**2) / tot,
                    0.0,
                )
            )
        work[k, i] = new
        work[i, k] = new
        alive[j] = False
        work[j, :] = INF
        work[:, j] = INF
        size[i] += size[j]
        label[label == label[j]] = label[i]
    return label


def _numpy_hdbscan(X, min_cluster_size: int, min_samples: int,
                   metric: str = "euclidean"):
    """HDBSCAN* (Campello/Moulavi/Sander 2013) + excess-of-mass cluster
    extraction, pure numpy — the algorithm behind the reference's
    hdbscan.HDBSCAN(min_cluster_size, min_samples)
    (/root/reference/src/linktransformer/cluster_fns.py:67-72),
    reimplemented so the engine needs no hdbscan package.

    Semantics mirrored from the published algorithm / library contract:

    - core distance of p = distance to its ``min_samples``-th nearest
      neighbor, with p itself occupying slot 0 (so min_samples=1 means
      the nearest OTHER point);
    - mutual reachability d_mr(a,b) = max(core(a), core(b), d(a,b));
    - single-linkage hierarchy = MST of the mutual-reachability graph;
    - condense with min_cluster_size: a split spawns two new clusters
      only when BOTH sides hold >= min_cluster_size points, otherwise
      the large side continues as its parent and the small side's
      points fall out at that level's lambda = 1/distance;
    - stability(C) = sum over members (lambda_leave - lambda_birth);
      excess-of-mass: a cluster is selected iff its stability >= the
      sum of its selected-subtree children's (parent wins ties), and
      the ROOT is never selectable (the library's
      allow_single_cluster=False default — a dataset that never splits
      into two viable clusters is all noise);
    - noise label -1; cluster labels are 0..k-1 in condensed-tree
      (BFS) order. Exact label NUMBERS may differ from the C library
      (tie order in the MST); the partition + noise set is the
      contract (SURVEY §1.3).

    Ties in MST edge weights break on lowest (weight, a, b) over the
    POSITIONAL indices — deterministic given the input row order;
    cluster_rows id-sorts every block before calling this kernel, so
    the operator-level partition is row-order independent.
    """
    import numpy as np

    mcs = int(min_cluster_size)
    if mcs < 2:
        raise ValueError("min cluster size must be >= 2")
    n = len(X)
    if n == 0:
        return np.empty(0, dtype="int64")
    if n < 2:
        return np.full(n, -1, dtype="int64")
    X = np.asarray(X, dtype="float64")
    if metric == "cosine":
        norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        D = 1.0 - (X / norms) @ (X / norms).T
        np.fill_diagonal(D, 0.0)
    elif metric == "euclidean":
        sq = (X * X).sum(axis=1)
        D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0))
        np.fill_diagonal(D, 0.0)
    else:
        raise ValueError(f"metric {metric!r} not supported (euclidean|cosine)")

    mp = min(n - 1, max(1, int(min_samples)))
    core = np.partition(D, mp, axis=1)[:, mp]  # slot 0 is self (dist 0)
    MR = np.maximum(np.maximum(core[:, None], core[None, :]), D)

    # ---- Prim MST over mutual reachability (O(n^2), dense) ----
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = MR[0].copy()
    best_from = np.zeros(n, dtype="int64")
    mst = []  # (weight, a, b)
    for _ in range(n - 1):
        cand = np.where(in_tree, np.inf, best)
        j = int(np.argmin(cand))
        a, b = int(best_from[j]), j
        mst.append((float(best[j]), min(a, b), max(a, b)))
        in_tree[j] = True
        upd = MR[j] < best
        best = np.where(upd, MR[j], best)
        best_from = np.where(upd, j, best_from)
    mst.sort()

    # ---- single-linkage dendrogram (union-find; internal ids n..2n-2) ----
    uf = np.arange(2 * n - 1, dtype="int64")

    def find(x):
        root = x
        while uf[root] != root:
            root = uf[root]
        while uf[x] != root:
            uf[x], x = root, uf[x]
        return root

    node_dist = np.zeros(2 * n - 1)
    node_size = np.ones(2 * n - 1, dtype="int64")
    kids = np.empty((2 * n - 1, 2), dtype="int64")
    nxt = n
    for w, a, b in mst:
        ra, rb = find(a), find(b)
        kids[nxt] = (ra, rb)
        node_dist[nxt] = w
        node_size[nxt] = node_size[ra] + node_size[rb]
        uf[ra] = uf[rb] = nxt
        nxt += 1
    root = 2 * n - 2

    # ---- condense: BFS from the root, min_cluster_size pruning ----
    # cluster records (condensed ids 0..): parent, birth lambda,
    # exits [(lambda, npoints)], cluster children
    c_parent, c_birth, c_exits, c_children = [-1], [0.0], [[]], [[]]
    pt_cluster = np.full(n, -1, dtype="int64")  # condensed cluster p fell from
    lam_of = lambda node: (1.0 / node_dist[node]) if node_dist[node] > 0 else np.inf

    def leaves_under(node):
        out, stack = [], [node]
        while stack:
            v = stack.pop()
            if v < n:
                out.append(v)
            else:
                stack.extend(kids[v])
        return out

    stack = [(root, 0)]  # (dendrogram node, condensed cluster id)
    while stack:
        node, c = stack.pop()
        lam = lam_of(node)
        left, right = int(kids[node][0]), int(kids[node][1])
        sizes = (int(node_size[left]), int(node_size[right]))
        big = [s >= mcs for s in sizes]
        if big[0] and big[1]:
            for ch, sz in ((left, sizes[0]), (right, sizes[1])):
                cid = len(c_parent)
                c_parent.append(c)
                c_birth.append(lam)
                c_exits.append([])
                c_children.append([])
                c_children[c].append(cid)
                c_exits[c].append((lam, sz))
                if ch >= n:
                    stack.append((ch, cid))
                else:  # can't happen for mcs >= 2; kept for clarity
                    pt_cluster[ch] = cid
        else:
            for ch, sz, isbig in ((left, sizes[0], big[0]), (right, sizes[1], big[1])):
                if isbig:
                    stack.append((ch, c))  # continues as the same cluster
                else:
                    for p in leaves_under(ch):
                        pt_cluster[p] = c
                    c_exits[c].append((lam, sz))

    # ---- stability + excess-of-mass selection ----
    k = len(c_parent)
    stab = np.zeros(k)
    for c in range(k):
        b = c_birth[c]
        for lam, sz in c_exits[c]:
            if not (np.isinf(lam) and np.isinf(b)):
                stab[c] += (lam - b) * sz
    hat = stab.copy()
    selected = np.zeros(k, dtype=bool)
    for c in range(k - 1, 0, -1):  # bottom-up (children have larger ids); root excluded
        child_sum = sum(hat[ch] for ch in c_children[c])
        if c_children[c] and child_sum > stab[c]:
            hat[c] = child_sum
        else:
            selected[c] = True
    # a selected cluster with a selected proper ancestor was overruled
    final = np.zeros(k, dtype=bool)
    for c in range(1, k):
        if not selected[c]:
            continue
        anc, shadowed = c_parent[c], False
        while anc > 0:
            if selected[anc]:
                shadowed = True
                break
            anc = c_parent[anc]
        final[c] = not shadowed

    label_of = {c: i for i, c in enumerate(np.flatnonzero(final).tolist())}
    labels = np.full(n, -1, dtype="int64")
    for p in range(n):
        c = int(pt_cluster[p])
        while c > 0 and not final[c]:
            c = c_parent[c]
        if c > 0 and final[c]:
            labels[p] = label_of[c]
    return labels


def _sklearn_cluster(work, orig_cols, cluster_type, params, cluster_col,
                     block_on=None):
    """Non-graph clustering (agglomerative / HDBSCAN): numpy
    implementations executed per BLOCK with applyInPandas (one Arrow
    group-map task per block; ``block_on=None`` = one global block, the
    reference's semantics — single-task, bounded by executor memory,
    documented small-data path; with blocking keys this is the scale
    path, same shape as merge_blocking).

    When the real hdbscan package is importable (not in this container)
    and block_on is None, HDBScan uses it driver-local for
    reference-exact extraction; otherwise the numpy HDBSCAN* runs.

    Parity note: the reference never forwards its "metric" default to
    HDBSCAN (cluster_fns.py:67-72 passes only min_cluster_size /
    min_samples), so HDBScan is euclidean there and here — the
    params["metric"] entry is vocabulary parity only.
    """
    import numpy as np

    # NOTE: the O(n^2) single-block warning is emitted by cluster_rows
    # BEFORE the encode step (counting the input df there avoids
    # re-executing join-based encoders — e.g. paid API calls — twice).

    if cluster_type == "HDBScan" and not block_on:
        try:
            import hdbscan
        except ImportError:
            pass  # numpy per-block path below
        else:
            # id-sorted input: the lib's tie behavior then sees a
            # partition-layout-independent row order
            pdf = work.toPandas().sort_values("_lt_id").reset_index(drop=True)
            emb = np.array(pdf["_lt_emb"].tolist(), dtype="float64")
            m = hdbscan.HDBSCAN(
                min_cluster_size=params["min cluster size"],
                min_samples=params["min samples"],
                gen_min_span_tree=True,
            )
            raw = m.fit(emb).labels_
            # canonicalize to the module contract (min row id per
            # cluster, noise -1) so lib and numpy paths agree
            ids = pdf["_lt_id"].to_numpy()
            lab = np.full(len(pdf), -1, dtype="int64")
            for u in np.unique(raw):
                if u < 0:
                    continue
                msk = raw == u
                lab[msk] = ids[msk].min()
            pdf[cluster_col] = lab
            spark = work.sparkSession
            keep = list(orig_cols) + [cluster_col, "_lt_id"]
            out = spark.createDataFrame(pdf[[c for c in keep if c in pdf.columns]])
            return out.withColumnRenamed("_lt_id", "_lt_cluster_row_id")

    # ---- numpy per-block applyInPandas (agglomerative | HDBScan) ----
    from pyspark.sql.types import LongType, StructField

    if cluster_type == "HDBScan":
        mcs = int(params["min cluster size"])
        ms = int(params["min samples"])

        def block_labels(X):
            return _numpy_hdbscan(X, mcs, ms, metric="euclidean")
    else:
        threshold = float(params["threshold"])
        linkage = params["clustering linkage"]
        metric = params["metric"]

        def block_labels(X):
            return _numpy_agglomerative(X, threshold, linkage, metric)

    keep = [c for c in list(orig_cols) + [LT_ID] if c in work.columns]
    narrow = work.select(*keep, "_lt_emb")
    out_schema = narrow.drop("_lt_emb").schema.add(StructField(cluster_col, LongType()))

    def fit(pdf):
        # id-sort the block first: positional tie-breaks inside the
        # numpy kernels (lowest (i, j) pair / MST (w, a, b)) are then
        # row-order independent across shuffle arrival orders
        pdf = pdf.sort_values(LT_ID).reset_index(drop=True)
        X = np.array(pdf["_lt_emb"].tolist(), dtype="float64")
        idx_labels = block_labels(X)
        ids = pdf[LT_ID].to_numpy()
        lab = np.full(len(pdf), -1, dtype="int64")
        for u in np.unique(idx_labels):
            if u < 0:
                continue  # HDBSCAN noise stays -1
            m = idx_labels == u
            lab[m] = ids[m].min()  # global label = min row id in cluster
        out = pdf.drop(columns=["_lt_emb"])
        out[cluster_col] = lab
        return out

    grouped = (
        narrow.groupBy(*block_on)
        if block_on
        else narrow.groupBy(F.lit(1).alias("_lt_blk"))
    )
    res = grouped.applyInPandas(fit, schema=out_schema)
    return res.withColumnRenamed(LT_ID, "_lt_cluster_row_id")


def dedup_rows(
    df: DataFrame,
    model=None,
    on=None,
    cluster_type: str = "SLINK",
    cluster_params: dict | None = None,
    id_col: str | None = None,
    deterministic_ids: bool = True,
    mode: str = "exact_cross",
    reference_noise_compat: bool = False,
) -> DataFrame:
    """Exact-dup drop (keep min-id) -> cluster -> keep min-id row per
    cluster. Noise rows are all retained unless reference_noise_compat
    (see module doc)."""
    on_list = [on] if isinstance(on, str) else list(on)
    work = with_row_id(df, id_col=id_col, deterministic=deterministic_ids)
    work = min_id_first(work, on_list)  # pandas keep="first" parity (infer.py:477)
    clustered = cluster_rows(
        work.drop(LT_ID),
        model=model,
        on=on,
        cluster_type=cluster_type,
        cluster_params=cluster_params,
        id_col=id_col,
        deterministic_ids=deterministic_ids,
        mode=mode,
    )
    rid = "_lt_cluster_row_id"
    if reference_noise_compat:
        w = Window.partitionBy("cluster").orderBy(F.col(rid).asc())
    else:
        # noise rows (cluster=-1) are singletons: partition them by row id
        w = Window.partitionBy(
            F.when(F.col("cluster") >= 0, F.col("cluster")).otherwise(-F.col(rid) - 2)
        ).orderBy(F.col(rid).asc())
    out = clustered.withColumn("_lt_rn", F.row_number().over(w)).filter(F.col("_lt_rn") == 1)
    return out.select(*df.columns)


def cluster(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str | None = None,
    cluster_type: str = "SLINK",
    cluster_params: dict | None = None,
    cluster_col: str = "cluster",
) -> DataFrame:
    """The reference's ``cluster`` dispatcher
    (/root/reference/src/linktransformer/cluster_fns.py:7-78), DataFrame
    form: labels rows by clustering a PRE-COMPUTED vector column (the
    reference takes a corpus_embeddings matrix). Same cluster_type /
    cluster_params vocabulary as cluster_rows, which is the text-column
    (embed-then-cluster) form."""
    from ..encoders.precomputed import PrecomputedEncoder
    from .knn_join import CosineScorer

    if id_col is None or vector_col not in df.columns:
        missing = vector_col if vector_col not in df.columns else None
        if missing:
            raise ValueError(f"vector column {missing!r} not in DataFrame")
        raise ValueError("id_col= is required for cluster()")
    return cluster_rows(
        df,
        model=CosineScorer(PrecomputedEncoder(vector_col)),
        on=id_col,
        cluster_type=cluster_type,
        cluster_params=cluster_params,
        id_col=id_col,
        cluster_col=cluster_col,
    )
