"""Vectorized hierarchical-precision / mAHP retrieval metrics.

Re-implements the reference evaluator (``/root/reference/class_hierarchy.py:
211-316``) around one key observation: the per-result similarity depends only
on the *class pair* (query class, retrieved class).  So instead of walking
every ranking with memoized per-pair recursion, we precompute the dense
class-pair similarity matrices once (``hierarchy.vectorized``) and turn the
whole evaluation into batched gathers + cumulative sums over blocks of
queries — the same structure the on-device retrieval path uses.

Semantics preserved exactly:
- P@k = sum of top-k similarities / optimal top-k cumulative similarity.
- AHP = trapezoid area under the normalized HP curve (``dx = 1/len``).
- Optimal ranking cached per query class; query-id removal cuts the optimal
  cumsum at the query's rank (``class_hierarchy.py:288-297``).
- AP with scores equal to the negated rank (``class_hierarchy.py:310-314``).
"""

from __future__ import annotations

import types

import numpy as np

from ..hierarchy.vectorized import pairwise_matrices


def _as_query_iter(retrieved):
    if isinstance(retrieved, (types.GeneratorType, list, tuple)):
        return iter(retrieved)
    return iter(retrieved.items())


def _delete_at(rows, pos):
    """Removes one element per row at per-row positions ``pos`` (all >= 0)."""
    b, n = rows.shape
    idx = np.arange(n - 1)[None, :] + (np.arange(n - 1)[None, :] >= pos[:, None])
    return np.take_along_axis(rows, idx, axis=1)


class _OptimalCumsums:
    """Per-class optimal (sorted-descending) cumulative similarity curves."""

    def __init__(self, sim_matrix):
        self.sim = sim_matrix
        self._cache = {}

    def for_class(self, class_idx, ret_class_counts):
        key = class_idx
        if key not in self._cache:
            sims = np.repeat(self.sim[class_idx], ret_class_counts)
            sims[::-1].sort()
            self._cache[key] = np.cumsum(sims)
        return self._cache[key]


def hierarchical_precision(
    hierarchy,
    retrieved,
    labels,
    ks=(1, 10, 50, 100),
    compute_ahp=False,
    compute_ap=False,
    ignore_qids=True,
    all_ids=None,
    block_size=256,
):
    """Average hierarchical precision over retrieval rankings.

    Parameters mirror the reference API (``class_hierarchy.py:211-238``):
    ``retrieved`` is a dict / generator of ``(query_id, ranked_id_list)``,
    ``labels`` maps image ids to class labels (dict, or list indexed by id).

    Returns ``(means, per_query)`` where ``means`` maps metric names
    (``"P@K (WUP)"``, ``"P@K (LCS_HEIGHT)"``, ``"AHP[@k] (...)"``, ``"AP"``)
    to averages and ``per_query`` maps them to ``{query_id: value}`` dicts.
    """
    if isinstance(ks, int):
        ks = [ks]
    ks = list(ks)

    label_of = labels.__getitem__

    ahp_suffix = "" if isinstance(compute_ahp, bool) else f"@{int(compute_ahp)}"
    metric_names = [f"P@{k} ({t})" for k in ks for t in ("WUP", "LCS_HEIGHT")]
    if compute_ahp:
        metric_names += [f"AHP{ahp_suffix} (WUP)", f"AHP{ahp_suffix} (LCS_HEIGHT)"]
    if compute_ap:
        metric_names.append("AP")
    per_query = {name: {} for name in metric_names}

    # Lazy state built from the first query's ranking (the database).
    state = {}

    def _init_state(ret):
        ids = list(ret)
        if all_ids and len(ids) < len(all_ids):
            seen = set(ids)
            ids = ids + [i for i in all_ids if i not in seen]
        id_index = {img: i for i, img in enumerate(ids)}
        img_labels = [label_of(i) for i in ids]
        classes = list(dict.fromkeys(img_labels))
        class_index = {c: i for i, c in enumerate(classes)}
        mats = pairwise_matrices(hierarchy, classes)
        wup_sim = mats["wup"]
        lcs_sim = 1.0 - mats["lcs_height"]
        img_class = np.array([class_index[l] for l in img_labels], dtype=np.int64)
        counts = np.bincount(img_class, minlength=len(classes))
        state.update(
            n_items=len(ids),
            id_index=id_index,
            class_index=class_index,
            wup_sim=wup_sim,
            lcs_sim=lcs_sim,
            img_class=img_class,
            counts=counts,
            best_wup=_OptimalCumsums(wup_sim),
            best_lcs=_OptimalCumsums(lcs_sim),
        )

    def _complete(ret):
        """Appends ids missing from a ranking, in all_ids order."""
        if all_ids and len(ret) < len(all_ids):
            seen = set(ret)
            return list(ret) + [i for i in all_ids if i not in seen]
        return list(ret)

    def _process_block(qids, rets):
        b = len(qids)
        n = state["n_items"]
        id_index = state["id_index"]
        ranked_cls = np.empty((b, n), dtype=np.int64)
        positions = np.empty((b, n), dtype=np.int64)
        for r, ret in enumerate(rets):
            pos = np.fromiter((id_index[i] for i in ret), dtype=np.int64, count=n)
            positions[r] = pos
            ranked_cls[r] = state["img_class"][pos]
        q_cls = np.array(
            [state["class_index"][label_of(q)] for q in qids], dtype=np.int64
        )

        wup = state["wup_sim"][q_cls[:, None], ranked_cls]
        lcs = state["lcs_sim"][q_cls[:, None], ranked_cls]
        best_w = np.stack(
            [state["best_wup"].for_class(c, state["counts"]) for c in q_cls]
        )
        best_l = np.stack(
            [state["best_lcs"].for_class(c, state["counts"]) for c in q_cls]
        )

        if ignore_qids:
            for q in qids:
                if q not in id_index:
                    raise ValueError(
                        f"Query id {q!r} does not occur in the ranked database; "
                        "rankings with external queries require ignore_qids=False."
                    )
            q_pos = np.array(
                [
                    int(np.argmax(positions[r] == id_index[q]))
                    for r, q in enumerate(qids)
                ],
                dtype=np.int64,
            )
            wup = _delete_at(wup, q_pos)
            lcs = _delete_at(lcs, q_pos)
            # Optimal curve with one perfect (sim 1.0) result removed at the
            # query's observed rank, as in class_hierarchy.py:294-295.
            shift = np.arange(n - 1)[None, :] >= q_pos[:, None]
            idx = np.arange(n - 1)[None, :] + shift
            best_w = np.take_along_axis(best_w, idx, axis=1) - shift
            best_l = np.take_along_axis(best_l, idx, axis=1) - shift
            rel = _delete_at(
                (ranked_cls == q_cls[:, None]).astype(np.float64), q_pos
            )
        else:
            rel = (ranked_cls == q_cls[:, None]).astype(np.float64)

        cum_w = np.cumsum(wup, axis=1)
        cum_l = np.cumsum(lcs, axis=1)
        m = cum_w.shape[1]

        for k in ks:
            pw = cum_w[:, k - 1] / best_w[:, k - 1]
            pl = cum_l[:, k - 1] / best_l[:, k - 1]
            for r, q in enumerate(qids):
                per_query[f"P@{k} (WUP)"][q] = pw[r]
                per_query[f"P@{k} (LCS_HEIGHT)"][q] = pl[r]

        if compute_ahp:
            kc = m if isinstance(compute_ahp, bool) else int(compute_ahp)
            ratio_w = cum_w[:, :kc] / best_w[:, :kc]
            ratio_l = cum_l[:, :kc] / best_l[:, :kc]
            dx = 1.0 / kc
            ahp_w = dx * (ratio_w.sum(axis=1) - (ratio_w[:, 0] + ratio_w[:, -1]) / 2)
            ahp_l = dx * (ratio_l.sum(axis=1) - (ratio_l[:, 0] + ratio_l[:, -1]) / 2)
            for r, q in enumerate(qids):
                per_query[f"AHP{ahp_suffix} (WUP)"][q] = ahp_w[r]
                per_query[f"AHP{ahp_suffix} (LCS_HEIGHT)"][q] = ahp_l[r]

        if compute_ap:
            cum_rel = np.cumsum(rel, axis=1)
            prec_at = cum_rel / np.arange(1, m + 1)[None, :]
            n_pos = cum_rel[:, -1]
            ap = (prec_at * rel).sum(axis=1) / np.maximum(n_pos, 1)
            for r, q in enumerate(qids):
                per_query["AP"][q] = ap[r]

    block_q, block_r = [], []
    for qid, ret in _as_query_iter(retrieved):
        ret = _complete(ret)
        if not state:
            _init_state(ret)
        if len(ret) != state["n_items"]:
            raise ValueError(
                "All rankings must cover the same database "
                f"({len(ret)} vs {state['n_items']} items); pass all_ids to "
                "pad incomplete rankings."
            )
        block_q.append(qid)
        block_r.append(ret)
        if len(block_q) >= block_size:
            _process_block(block_q, block_r)
            block_q, block_r = [], []
    if block_q:
        _process_block(block_q, block_r)

    means = {
        name: sum(values.values()) / len(values)
        for name, values in per_query.items()
    }
    return means, per_query
