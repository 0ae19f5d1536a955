"""All-pairs retrieval: blockwise device GEMM + ranking + metric core.

The reference materializes the full N x N distance matrix on the host and
argsorts it (``/root/reference/evaluate_retrieval.py:56-67``) — 2.5 G floats
for ILSVRC val.  Here query blocks stream through the device: one
(B x d) @ (d x N) GEMM on the MXU per block, ranking on device, and the
hierarchical-precision math consumes the ranking block immediately
(:class:`~semantic_embeddings_tpu.evaluation.hierarchical.HPEvaluator`), so
peak memory is O(B * N) instead of O(N^2).  On a multi-chip mesh the
default is a replicated database with query blocks sharded on the ``data``
axis (per-block work embarrassingly parallel); ``db_sharded=True`` instead
shards the DATABASE rows across chips — per-chip exact top-k + one small
cross-chip candidate merge (:func:`_db_sharded_ranker`) — for O(N/n_dev)
database memory at large scales.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..embeddings.io import load_features
from .hierarchical import HPEvaluator


def _ranking_fn(normalize):
    """Jitted (queries_block, database) -> ranked database indices."""

    @jax.jit
    def rank(queries, database, q_index):
        if normalize:
            sims = queries @ database.T
            # Self-similarity forced to +inf so every query ranks itself
            # first; the evaluator then drops rank 0 (qid removal).
            order = jnp.argsort(
                -sims.at[jnp.arange(queries.shape[0]), q_index].set(jnp.inf),
                axis=-1,
                stable=True,
            )
        else:
            sq_db = jnp.sum(database * database, axis=-1)
            sq_q = jnp.sum(queries * queries, axis=-1)
            dists = sq_q[:, None] + sq_db[None, :] - 2.0 * (queries @ database.T)
            order = jnp.argsort(
                dists.at[jnp.arange(queries.shape[0]), q_index].set(-jnp.inf),
                axis=-1,
                stable=True,
            )
        return order

    return rank


def pairwise_ranking_blocks(features, normalize=False, block_size=1024,
                            mesh=None):
    """Yields ``(start, ranking_block)`` with the query pinned to rank 0.

    ``features``: (N, d) array.  The database stays resident on device; each
    block is one MXU GEMM + device sort.  With a ``mesh``, the database is
    replicated and each query block is sharded on the ``data`` axis, so the
    per-row GEMM + sort fan out across chips with no collectives.
    """
    feats = np.asarray(features, dtype=np.float32)
    if normalize:
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    n = feats.shape[0]
    if mesh is not None:
        from ..parallel import batch_sharding, replicated

        n_dev = mesh.devices.size
        block_size = max(block_size, n_dev)
        block_size += (-block_size) % n_dev  # divisible by the mesh size
        database = jax.device_put(jnp.asarray(feats), replicated(mesh))
        q_shard = batch_sharding(mesh)
        rank = _ranking_fn(normalize)
        for start in range(0, n, block_size):
            stop = min(start + block_size, n)
            # pad the tail block so its leading axis stays shardable
            idx = np.minimum(np.arange(start, start + block_size), n - 1)
            queries = jax.device_put(jnp.asarray(feats[idx]), q_shard)
            block = rank(queries, database, jnp.asarray(idx))
            yield start, np.asarray(block)[: stop - start]
        return
    database = jnp.asarray(feats)
    rank = _ranking_fn(normalize)
    for start in range(0, n, block_size):
        stop = min(start + block_size, n)
        q_index = jnp.arange(start, stop)
        block = rank(database[start:stop], database, q_index)
        yield start, np.asarray(block)


def pairwise_retrieval(features, normalize=False, return_generator=True):
    """Reference-compatible API (``evaluate_retrieval.py:22-73``): yields
    ``(query_id, ranked id list)`` per query, ids taken from the feature dict
    keys (or positional indices)."""
    ids, feats = load_features(features)

    def gen():
        for start, block in pairwise_ranking_blocks(feats, normalize):
            for row_idx, row in enumerate(block):
                # The reference ranks the query by plain distance sorting
                # (usually but not necessarily first); downstream qid
                # removal deletes it wherever it appears, so pinning it to
                # rank 0 is order-equivalent after removal.
                qid = start + row_idx
                if ids is not None:
                    yield ids[qid], ids[row].tolist()
                else:
                    yield qid, row.tolist()

    return gen() if return_generator else dict(gen())


def _db_sharded_ranker(mesh, normalize, topk, n_real):
    """(queries, database, q_index) -> top-(topk+1) GLOBAL indices with the
    database SHARDED on its row axis across the mesh (O(N/n_dev) database
    memory per chip instead of O(N)).

    The two-stage trick of ``ops/topk.py`` lifted onto the mesh axis: each
    chip computes an exact local top-k over its database shard (local sims
    never leave the chip), then the (n_dev * k) candidates per query ride
    one small ``all_gather`` and a final (value desc, index asc) sort
    merges them — bit-identical to the replicated ranking incl. tie order
    (per-chip candidates are index-ascending among equal values, chips are
    offset-ordered, and the merge re-sorts by explicit global index).

    Closes SURVEY §5.7's "stream database blocks" requirement: at
    iNat-2018 scale (461k x 1024 f32) the replicated database costs
    ~1.9 GB/chip; sharded it is ~240 MB on 8 chips.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS
    from ..ops.topk import exact_topk

    k_out = topk + 1  # query self-hit rides at rank 0, stripped downstream

    def local(queries, db_local):
        ax = jax.lax.axis_index(DATA_AXIS)
        n_local = db_local.shape[0]
        if normalize:
            sims = queries @ db_local.T
        else:
            sq_db = jnp.sum(db_local * db_local, axis=-1)
            sq_q = jnp.sum(queries * queries, axis=-1)
            sims = -(sq_q[:, None] + sq_db[None, :]) + 2.0 * (
                queries @ db_local.T
            )
        gids = ax * n_local + jnp.arange(n_local, dtype=jnp.int32)
        # rows beyond the real database (shard padding) can never win
        sims = jnp.where(gids[None, :] >= n_real, -jnp.inf, sims)
        k_local = min(k_out, n_local)
        vals, idx = exact_topk(sims, k_local)
        gidx = (idx + ax * n_local).astype(jnp.int32)
        vals_g = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        gidx_g = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)
        # merge: ascending (-value, global index) == descending value with
        # lax.top_k's smaller-index-wins tie rule
        _, merged = jax.lax.sort((-vals_g, gidx_g), dimension=1, num_keys=2)
        return merged[:, :k_out]

    ranker = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
        check_rep=False,
    )

    @jax.jit
    def rank(queries, database, q_index):
        # Pin the query itself to rank 0 (qid-removal semantics) WITHOUT
        # touching the sharded sims: its global index is known, so just
        # prepend it and drop any duplicate occurrence from the merge.
        merged = ranker(queries, database)  # (B, topk+1) global ids
        is_self = merged == q_index[:, None]
        # stable partition: self (if found) removed, others keep order
        order = jnp.argsort(is_self, axis=1, stable=True)
        no_self = jnp.take_along_axis(merged, order[:, : k_out - 1], axis=1)
        return jnp.concatenate([q_index[:, None].astype(jnp.int32),
                                no_self.astype(jnp.int32)], axis=1)

    return rank


def _device_metric_fn(evaluator, normalize, topk=None, ranker=None):
    """One jitted call: query block -> ranking -> HP/AHP/AP scalars.

    ``ranker``: optional external ranking fn (the DB-sharded top-k merge,
    :func:`_db_sharded_ranker`) returning (B, topk+1) global indices with
    the query at rank 0; replaces the in-function sims+sort.

    Fuses the GEMM, sort, class gathers, cumulative sums and metric
    reductions so only per-query scalars leave the device.  Assumes the
    query is pinned to rank 0 and dropped (ignore_qids semantics with the
    optimal cumsum cut at rank 0).

    ``topk``: when the requested metrics only need a ranking prefix
    (P@k + clipped AHP, no AP), rank via ``lax.top_k(topk)`` instead of a
    full N-wide sort — the reference's ILSVRC protocol (mAHP@250) needs
    only the top 250 of 50k, and the optimal-cumsum tables shrink from
    (C, N-1) to (C, topk).
    """
    ks = evaluator.ks
    compute_ahp = evaluator.compute_ahp
    compute_ap = evaluator.compute_ap
    if topk is not None and (compute_ap or isinstance(compute_ahp, bool)
                             and compute_ahp):
        raise ValueError("topk requires compute_ap=False and clipped AHP")
    # Per-class optimal cumulative curves with the self result removed:
    # best[1:] - 1.0 (class_hierarchy.py:294-295 with qid at rank 0).
    n_cls = evaluator.wup_sim.shape[0]
    best_w = np.stack(
        [evaluator._best_cum(c)[0][1:] - 1.0 for c in range(n_cls)]
    ).astype(np.float32)
    best_l = np.stack(
        [evaluator._best_cum(c)[1][1:] - 1.0 for c in range(n_cls)]
    ).astype(np.float32)
    if topk is not None:
        best_w = best_w[:, :topk]
        best_l = best_l[:, :topk]

    # Device-resident lookup tables.  These MUST enter the jitted function
    # as arguments, not closure constants: best_w/best_l are (C, N-1) —
    # 200 MB each at ILSVRC-val scale — and closure constants get embedded
    # into the serialized HLO (the remote compile service rejects the
    # oversized program with HTTP 413).
    wup_sim = jnp.asarray(evaluator.wup_sim, dtype=jnp.float32)
    lcs_sim = jnp.asarray(evaluator.lcs_sim, dtype=jnp.float32)
    best_w = jnp.asarray(best_w)
    best_l = jnp.asarray(best_l)
    db_classes = jnp.asarray(evaluator.db_classes, dtype=jnp.int32)

    @jax.jit
    def _impl(queries, database, q_index, wup_sim, lcs_sim, best_w, best_l,
              db_classes):
        # Rank class ids directly as the sort payload: ~6x faster than
        # argsort + gather on TPU (the metrics never need item indices).
        # lax.sort is stable, so ties keep database order like the stable
        # argsort path.
        if ranker is not None:
            idx = ranker(queries, database, q_index)
            ranked_cls = db_classes[idx[:, 1:]]
            sims = None
        else:
            if normalize:
                sims = queries @ database.T
            else:
                sq_db = jnp.sum(database * database, axis=-1)
                sq_q = jnp.sum(queries * queries, axis=-1)
                sims = -(sq_q[:, None] + sq_db[None, :]) + 2.0 * (
                    queries @ database.T
                )
            sims = sims.at[
                jnp.arange(queries.shape[0]), q_index].set(jnp.inf)
        if topk is not None and ranker is None:
            # Prefix ranking: exact chunked top-k (ops/topk.py) — identical
            # results to lax.top_k incl. ascending-index tie order (matching
            # the stable descending sort below), but ~1.6x faster: XLA:TPU
            # lowers a row-wide top_k to a FULL variadic sort (measured 87%
            # of device time at 50k items), while the two-stage reduction
            # only sorts chunk-wide rows plus the surviving candidates.
            from ..ops.topk import exact_topk

            _, idx = exact_topk(sims, topk + 1)
            ranked_cls = db_classes[idx[:, 1:]]
        elif ranker is None:
            payload = jnp.broadcast_to(db_classes[None, :], sims.shape)
            _, ranked = jax.lax.sort_key_val(-sims, payload, dimension=-1)
            ranked_cls = ranked[:, 1:]  # self dropped at rank 0
        q_cls = db_classes[q_index]
        wup = wup_sim[q_cls[:, None], ranked_cls]
        lcs = lcs_sim[q_cls[:, None], ranked_cls]
        bw = best_w[q_cls]
        bl = best_l[q_cls]
        cum_w = jnp.cumsum(wup, axis=1)
        cum_l = jnp.cumsum(lcs, axis=1)
        out = {}
        for k in ks:
            out[f"P@{k} (WUP)"] = cum_w[:, k - 1] / bw[:, k - 1]
            out[f"P@{k} (LCS_HEIGHT)"] = cum_l[:, k - 1] / bl[:, k - 1]
        if compute_ahp:
            m = cum_w.shape[1]
            kc = m if isinstance(compute_ahp, bool) else min(int(compute_ahp), m)
            dx = 1.0 / (
                m if isinstance(compute_ahp, bool) else int(compute_ahp)
            )
            suffix = evaluator.ahp_suffix
            for tag, cum, bst in (("WUP", cum_w, bw), ("LCS_HEIGHT", cum_l, bl)):
                ratio = cum[:, :kc] / bst[:, :kc]
                out[f"AHP{suffix} ({tag})"] = dx * (
                    ratio.sum(axis=1) - (ratio[:, 0] + ratio[:, -1]) / 2
                )
        if compute_ap:
            rel = (ranked_cls == q_cls[:, None]).astype(jnp.float32)
            cum_rel = jnp.cumsum(rel, axis=1)
            prec_at = cum_rel / jnp.arange(1, rel.shape[1] + 1)[None, :]
            n_pos = cum_rel[:, -1]
            out["AP"] = (prec_at * rel).sum(axis=1) / jnp.maximum(n_pos, 1)
        return out

    def block_metrics(queries, database, q_index):
        return _impl(queries, database, q_index, wup_sim, lcs_sim,
                     best_w, best_l, db_classes)

    return block_metrics


def evaluate_retrieval_features(
    features,
    labels,
    hierarchy,
    ks=(1, 10, 50, 100),
    compute_ahp=True,
    compute_ap=True,
    normalize=False,
    block_size=None,
    mesh=None,
    db_sharded=False,
):
    """Full device-path evaluation: features -> hierarchical metrics.

    ``labels``: per-item class labels aligned with feature rows.
    ``block_size``: queries per device call; default adapts to the
    database size (targets a ~2 GB on-device similarity block — larger
    blocks amortize the per-dispatch latency, which dominates on a
    tunneled backend).
    ``db_sharded``: with a ``mesh``, shard the DATABASE rows across chips
    (O(N/n_dev) database memory each) instead of replicating it; requires
    the top-k prefix protocol (no AP, clipped AHP) — the cross-chip merge
    is a k-way candidate merge, identical results to the replicated path
    (tested).  Default remains query-sharded + replicated database.
    Returns ``(means, per_query)`` with the reference's metric names.
    """
    ids, feats = load_features(features)
    if ids is not None:
        # The dump format keys rows by image ID (arbitrary order allowed);
        # the reference pairs labels_test[id] per row — positional pairing
        # would silently mislabel any non-ascending dump.
        labels = [labels[i] for i in ids]
    else:
        labels = list(labels)
    if len(labels) != len(feats):
        # jnp gathers CLAMP out-of-bounds indices, so a short labels list
        # would silently misattribute every item beyond its end instead of
        # raising like the host path does.
        raise ValueError(
            f"labels has {len(labels)} entries for {len(feats)} feature rows"
        )
    classes = list(dict.fromkeys(labels))
    class_index = {c: i for i, c in enumerate(classes)}
    db_classes = np.array([class_index[l] for l in labels], dtype=np.int64)

    evaluator = HPEvaluator(
        hierarchy, db_classes, classes, ks=ks, compute_ahp=compute_ahp,
        compute_ap=compute_ap, ignore_qids=True,
    )
    accum = {name: [] for name in evaluator.metric_names}

    feats_arr = np.asarray(feats, dtype=np.float32)
    if normalize:
        feats_arr = feats_arr / np.linalg.norm(feats_arr, axis=-1, keepdims=True)
    n = feats_arr.shape[0]
    # When every requested metric only needs a ranking prefix (P@k and
    # clipped AHP, no AP), rank via top_k instead of a full N-wide sort —
    # the dominant cost at ILSVRC scale (mAHP@250 over 50k items).
    topk = None
    if not compute_ap and not (isinstance(compute_ahp, bool) and compute_ahp):
        limit = max(ks) if ks else 1
        if compute_ahp:
            limit = max(limit, int(compute_ahp))
        if limit < n - 1:
            topk = limit
    if block_size is None:
        # ~2 GB f32 similarity block, power-of-two, within [1024, 8192].
        block_size = int(min(8192, max(1024, 2 ** int(np.log2(
            max(1.0, 2e9 / 4.0 / max(n, 1)))))))
    ranker = None
    if db_sharded:
        if mesh is None:
            raise ValueError("db_sharded needs a mesh")
        if topk is None:
            raise ValueError(
                "db_sharded requires the top-k prefix protocol "
                "(compute_ap=False and a clipped compute_ahp): full-sort "
                "metrics need every rank, which a sharded database cannot "
                "produce without an all-to-all of the whole sims matrix"
            )
        ranker = _db_sharded_ranker(mesh, normalize, topk, n_real=n)
    block_metrics = _device_metric_fn(
        evaluator, normalize, topk=topk, ranker=ranker)
    if mesh is not None:
        from ..parallel import DATA_AXIS, batch_sharding, replicated
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.devices.size
        block_size = max(block_size, n_dev)
        block_size += (-block_size) % n_dev
        if db_sharded:
            # pad the database rows to a mesh multiple; padded rows are
            # masked to -inf inside the sharded ranker
            pad = (-n) % n_dev
            db_host = np.pad(feats_arr, ((0, pad), (0, 0)))
            database = jax.device_put(
                jnp.asarray(db_host),
                NamedSharding(mesh, PartitionSpec(DATA_AXIS)))
            # queries are replicated: every chip scores every query
            # against its own database shard
            q_shard = replicated(mesh)
        else:
            database = jax.device_put(
                jnp.asarray(feats_arr), replicated(mesh))
            q_shard = batch_sharding(mesh)
    else:
        database = jnp.asarray(feats_arr)
        q_shard = None
    # Enqueue every block before fetching anything: dispatch is async, so
    # the blocks pipeline on device, and the (high-latency on a tunneled
    # backend) host<->device round trip is paid once, not per block.
    pending = []
    for start in range(0, n, block_size):
        stop = min(start + block_size, n)
        idx = np.minimum(np.arange(start, start + block_size), n - 1)
        queries = jnp.asarray(feats_arr[idx])
        q_index = jnp.asarray(idx)
        if q_shard is not None:
            queries = jax.device_put(queries, q_shard)
        pending.append((stop - start, block_metrics(queries, database, q_index)))
    fetched = jax.device_get([r for _, r in pending])  # ONE transfer
    for (width, _), result in zip(pending, fetched):
        for name, values in result.items():
            accum[name].append(np.asarray(values, dtype=np.float64)[:width])

    per_query_arr = {name: np.concatenate(vals) for name, vals in accum.items()}
    means = {name: float(vals.mean()) for name, vals in per_query_arr.items()}
    if ids is None:
        per_query = {
            name: dict(enumerate(vals)) for name, vals in per_query_arr.items()
        }
    else:
        per_query = {
            name: {ids[i]: v for i, v in enumerate(vals)}
            for name, vals in per_query_arr.items()
        }
    return means, per_query
