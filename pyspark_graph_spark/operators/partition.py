"""Multilevel k-way graph partitioning — coarsen, partition, project.

The METIS recipe (Karypis & Kumar, SIAM J. Sci. Comput. 1998) on
DataFrames: repeatedly contract a maximal matching (operators/matching.py
``coarsen``) until the supervertex graph fits one Arrow batch, assign the
coarsest supervertices to k parts by greedy least-loaded bin packing
weighted by how many fine vertices each supervertex carries, then project
the labels back down through the composed contraction mappings.

Scale shape: every level is the matching peel (shuffles keyed on vertex)
plus two hash joins; the only non-distributed step is the final
assignment, which by construction runs on <= ``max_coarse`` rows inside a
single ``applyInPandas`` group — a bounded batch, not a driver collect.
The greedy least-loaded rule carries Graham's list-scheduling bound:
max part load <= (total/k) + max item, which ``run`` exposes as an
exactly checkable invariant (the gate oracle pins its violation count to
zero).

Refinement (FM-flavored boundary moves) ships as ``refine()`` below: per
round it thins positive-gain movers to a Luby-style independent set and
caps per-part intake, which makes the cut improvement provably monotone
(accepted movers are pairwise non-adjacent, so gains are exact and
additive against the frozen neighbor assignment). The gate query
``partition_refine`` pins cut_after <= cut_before, balance <= cap, and
assignment totality as zero-defect invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.matching import MaximalMatching, coarsen


def two_hop_pairs(g: Graph, matching: DataFrame) -> DataFrame:
    """Pair UNMATCHED vertices that share a neighbor — 2-hop matching
    (Karypis, METIS 5 / LaSalle & Karypis mt-Metis: the hub-star fix).

    On hub-skewed graphs an edge matching leaves almost every star leaf
    unmatched (the hub can match only one of them), so the per-level
    shrink factor of matching-based coarsening degrades from ~0.55 toward
    1 and level count explodes — measured at real-sf1 as the 8.7× weak-
    scale row in SCALE.md round 7. Leaves that share a hub are
    interchangeable for partitioning purposes, so contracting them
    PAIRWISE restores ~0.5 shrink without touching the hub itself.

    Deterministic, all vertex-keyed: each unmatched vertex picks its
    minimum-id neighbor as its anchor, leaves are ranked per anchor by
    id, and consecutive ranks pair up (odd leaf out stays unmatched).
    Returned pairs are vertex-disjoint from ``matching`` (both endpoints
    were unmatched) and from each other (each rank appears once), so the
    union is still a valid contraction set for ``coarsen`` — which uses
    pairs only as a vertex mapping, never as edges.

    Skew safety at scale: the ranking window partitions by anchor, and a
    mega-hub anchor is exactly the input this function exists for — so
    anchors with many leaves are hash-split into sub-buckets of ~2×128
    leaves (count-scaled, so the split is a no-op below 256 leaves per
    anchor) and pairing runs within each sub-bucket. Cost: at most one
    unpaired leftover per sub-bucket (~0.8% of a large star) for bounded
    window partitions; determinism is unchanged (xxhash64 bucketing,
    id-ordered ranks)."""
    matched = matching.select(F.col(SRC).alias(ID)).unionByName(
        matching.select(F.col(DST).alias(ID))
    )
    sym = g.edges.select(SRC, DST).unionByName(
        g.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    anchors = (
        sym.join(matched.withColumnRenamed(ID, SRC), on=SRC, how="anti")
        .groupBy(SRC)
        .agg(F.min(DST).alias("__anchor"))
    )
    counts = anchors.groupBy("__anchor").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    bucketed = anchors.join(counts, on="__anchor").withColumn(
        "__b",
        F.pmod(
            F.xxhash64(SRC),
            F.greatest(
                F.lit(1).cast("long"),
                F.shiftright(F.col("__cnt"), 7),  # exact __cnt DIV 128
            ),
        ),
    )
    w = Window.partitionBy("__anchor", "__b").orderBy(SRC)
    ranked = bucketed.withColumn(
        "__pair", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(2))
    )
    return (
        ranked.groupBy("__anchor", "__b", "__pair")
        .agg(
            F.min(SRC).alias(SRC),
            F.max(SRC).alias(DST),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") == 2)
        .select(SRC, DST)
    )


class MultilevelPartition:
    """``run(g)`` returns (id, part, super) for every vertex, part in
    [0, k); ``super`` is the coarsest supervertex the vertex contracted
    into (exposed for audits and locality-aware placement).

    ``max_coarse`` bounds the coarsest level (and therefore the single
    Arrow batch the bin packing runs on). Coarsening stops early when a
    level yields no matching (isolated-vertex-only residue); if the
    graph still exceeds ``max_batch`` supervertices at that point, run
    raises rather than silently shipping an unbounded batch.

    Once a level's vertex AND edge lists both fit ``batch_finish`` rows
    (the same bounded-batch class as MaximalMatching's tail finish and
    greedy_coloring's ``_batch_color``), the REST of the multilevel
    recipe — every remaining match/contract level, the 2-hop pairing,
    and the final greedy bin packing — runs inside one cogrouped Arrow
    batch, bit-identical to the distributed loop: matchings replay the
    sequential greedy the peel provably converges to (module docstring
    of operators/matching.py) over the same xxhash64(src, dst, seed+lvl)
    priorities (NumPy replica, pinned by tests/test_xxh64_np.py), the
    2-hop pairing replays two_hop_pairs' anchor/bucket/rank arithmetic
    over the same xxhash64(src) buckets, and the packing is the same
    heap loop ``run`` already executed as a bounded batch. The
    distributed per-level path remains for graphs above the bound
    (r11: each level cost ~8 fixed-overhead jobs at gate scale;
    batch_finish=0 disables).
    """

    def __init__(
        self,
        k: int = 4,
        max_coarse: int = 256,
        # levels needed grow as log(n/max_coarse) with a ~0.55-0.6 per-level
        # shrink factor (matchings are maximal, not perfect): 30 covers any
        # realistic n; extra iterations cost nothing once below max_coarse
        max_levels: int = 30,
        max_batch: int = 100_000,
        seed: int = 0,
        first_matching: DataFrame | None = None,
        two_hop: bool | str = "auto",
        batch_finish: int = 1_000_000,
    ):
        if k < 1:
            raise ValueError("k must be positive")
        if two_hop not in (True, False, "auto"):
            raise ValueError("two_hop must be True, False, or 'auto'")
        self.k = k
        self.max_coarse = max_coarse
        self.max_levels = max_levels
        self.max_batch = max_batch
        self.seed = seed
        self.batch_finish = batch_finish
        # optional precomputed level-0 matching (src, dst) — the level-0
        # peel is the partitioner's dominant cost and is often already
        # computed by a sibling consumer (the gate's shared matching cache)
        self.first_matching = first_matching
        # augment a level's edge matching with 2-hop pairs of the unmatched
        # star leaves (two_hop_pairs above) — restores ~0.5 per-level
        # shrink on hub-skewed graphs. "auto" (default, round 8) turns the
        # augmentation on only after a level's REALIZED shrink degrades
        # past 0.7 (hub starvation evidence) and back off when shrink
        # recovers — the vertex counts are already taken by the loop
        # guard, so the heuristic costs zero extra actions. On dense
        # graphs the matching is near-perfect and the 2-hop pass is
        # measured pure overhead (~4 extra shuffle stages per level for an
        # 8.1× vs 8.7× noise-band delta, SCALE.md round 7: True 19.1 s vs
        # auto 12-15 s vs False 11.7 s on the sf0.1 supplier corpus);
        # on star forests it is the difference between O(log n) and O(n)
        # levels (SCALE.md round 8) at the cost of one extra probe level.
        self.two_hop = two_hop

    def run(self, g: Graph) -> DataFrame:
        cur = g
        # fine id -> current-level supervertex, folded as we descend
        comp = g.vertices.select(ID, F.col(ID).alias("super"))
        prev_n: int | None = None
        hub_starved = False
        for lvl in range(self.max_levels):
            n_v = cur.vertices.count()
            if n_v <= self.max_coarse:
                break
            if (
                self.batch_finish
                and n_v <= self.batch_finish
                and cur.edges.count() <= self.batch_finish
            ):
                return self._finish_batched(cur, comp, lvl, prev_n)
            if prev_n is not None:
                hub_starved = n_v > 0.7 * prev_n
            prev_n = n_v
            if lvl == 0 and self.first_matching is not None:
                m = self.first_matching
            else:
                m = MaximalMatching(seed=self.seed + lvl).run(cur)
            use_two_hop = self.two_hop is True or (
                self.two_hop == "auto" and hub_starved
            )
            if use_two_hop:
                m = (
                    m.select(SRC, DST)
                    .unionByName(two_hop_pairs(cur, m))
                    .localCheckpoint()
                )
            if m.isEmpty():
                break  # nothing contractible (isolated residue)
            # level >= 1 edges carry coarsen's own weight column: sum it
            # so cut bookkeeping stays in fine-edge units at every level
            cur, mapping = coarsen(cur, m, sum_weights=(lvl > 0))
            comp = (
                comp.join(
                    mapping.select(
                        F.col(ID).alias("super"),
                        F.col("super").alias("__next"),
                    ),
                    on="super",
                )
                .select(ID, F.col("__next").alias("super"))
                .localCheckpoint()
            )

        sizes = comp.groupBy("super").agg(F.count(F.lit(1)).alias("size"))
        n_coarse = sizes.count()
        if n_coarse > self.max_batch:
            raise ValueError(
                f"coarsening stalled at {n_coarse} supervertices "
                f"(> max_batch={self.max_batch}); the residue has no "
                "matchable edges — partition components separately or "
                "raise max_batch"
            )

        return self._pack_and_project(comp, sizes)

    def _finish_batched(
        self,
        cur: Graph,
        comp: DataFrame,
        lvl: int,
        prev_n: int | None,
    ) -> DataFrame:
        """Run the remaining levels + packing inside one cogrouped Arrow
        batch (docstring of the class). ``cur`` fits ``batch_finish``
        rows on both frames; ``comp`` maps fine ids to ``cur``'s
        vertices. The kernel's output is one row per current-level
        vertex: its coarsest supervertex and part; ``part = -1`` rows
        signal the coarsening-stalled overflow the distributed loop
        raises on."""
        if lvl == 0:
            vsz = cur.vertices.select(
                F.col(ID).alias("v"), F.lit(1).cast("long").alias("size")
            )
        else:
            vsz = (
                comp.groupBy("super")
                .agg(F.count(F.lit(1)).alias("size"))
                .select(F.col("super").alias("v"), "size")
            )
        e = cur.edges.select(SRC, DST).withColumn("__m", F.lit(0))
        has_fm = lvl == 0 and self.first_matching is not None
        if has_fm:
            e = e.unionByName(
                self.first_matching.select(SRC, DST).withColumn(
                    "__m", F.lit(1)
                )
            )
        vb = vsz.withColumn("__g", F.lit(0))
        eb = e.withColumn("__g", F.lit(0))

        k = self.k
        max_coarse = self.max_coarse
        max_levels = self.max_levels
        max_batch = self.max_batch
        seed = self.seed
        two_hop = self.two_hop
        lvl_entry = lvl
        prev_n_in = -1 if prev_n is None else prev_n

        def local_finish(vp, ep):
            import heapq

            import numpy as np
            import pandas as pd

            from pyspark_graph_spark.functions.xxh64_np import (
                xxhash64_long,
                xxhash64_long_long_int,
            )

            _empty = np.empty(0, dtype=np.int64)

            def two_hop_np(s, d, ms, md):
                """NumPy replay of two_hop_pairs over the raw sym edge
                list — same anchors, same xxhash64(src) sub-buckets,
                same id-ordered consecutive pairing."""
                if len(s) == 0:
                    return _empty, _empty
                src_sym = np.concatenate([s, d])
                dst_sym = np.concatenate([d, s])
                matched = np.concatenate([ms, md])
                unm = ~np.isin(src_sym, matched)
                su, du = src_sym[unm], dst_sym[unm]
                if len(su) == 0:
                    return _empty, _empty
                uids, inv = np.unique(su, return_inverse=True)
                anchor = np.full(
                    len(uids), np.iinfo(np.int64).max, dtype=np.int64
                )
                np.minimum.at(anchor, inv, du)
                ua, ainv = np.unique(anchor, return_inverse=True)
                cnt = np.bincount(ainv).astype(np.int64)
                nb = np.maximum(1, cnt[ainv] >> 7)  # exact cnt DIV 128
                b = xxhash64_long(uids) % nb  # floored mod = Spark pmod
                order = np.lexsort((uids, b, anchor))
                a_o, b_o, u_o = anchor[order], b[order], uids[order]
                newg = np.ones(len(u_o), dtype=bool)
                newg[1:] = (a_o[1:] != a_o[:-1]) | (b_o[1:] != b_o[:-1])
                gidx = np.cumsum(newg) - 1
                starts = np.flatnonzero(newg)
                rank = np.arange(len(u_o)) - starts[gidx]
                first = rank % 2 == 0
                has_next = np.zeros(len(u_o), dtype=bool)
                has_next[:-1] = first[:-1] & (gidx[1:] == gidx[:-1])
                return u_o[has_next], u_o[np.flatnonzero(has_next) + 1]

            entry = vp["v"].to_numpy().astype(np.int64, copy=True)
            vs_size = vp["size"].to_numpy().astype(np.int64, copy=True)
            em = ep["__m"].to_numpy()
            s_all = ep[SRC].to_numpy().astype(np.int64, copy=False)
            d_all = ep[DST].to_numpy().astype(np.int64, copy=False)
            s = s_all[em == 0].copy()
            d = d_all[em == 0].copy()
            fm_s = s_all[em == 1].copy()
            fm_d = d_all[em == 1].copy()

            vs_ids = entry.copy()
            sup_of_entry = entry.copy()
            n_prev = None if prev_n_in < 0 else prev_n_in
            hub_starved = False

            lvl_cur = lvl_entry
            while lvl_cur < max_levels:
                n_v = len(vs_ids)
                if n_v <= max_coarse:
                    break
                if n_prev is not None:
                    hub_starved = n_v > 0.7 * n_prev
                n_prev = n_v
                if lvl_cur == lvl_entry and len(fm_s):
                    ms, md = fm_s, fm_d
                else:
                    # canonical (min, max) distinct edges, then the
                    # sequential greedy the peel provably converges to:
                    # sort by (priority, src, dst), take vertex-disjoint
                    lo = np.minimum(s, d)
                    hi = np.maximum(s, d)
                    keep = lo < hi
                    lo, hi = lo[keep], hi[keep]
                    if len(lo):
                        pairs = np.unique(
                            np.stack([lo, hi], axis=1), axis=0
                        )
                        clo, chi = (
                            pairs[:, 0].copy(),
                            pairs[:, 1].copy(),
                        )
                    else:
                        clo = chi = _empty
                    pri = xxhash64_long_long_int(clo, chi, seed + lvl_cur)
                    order = np.lexsort((chi, clo, pri))
                    taken: set = set()
                    ms_l: list = []
                    md_l: list = []
                    for i in order:
                        a = int(clo[i])
                        bb = int(chi[i])
                        if a not in taken and bb not in taken:
                            taken.add(a)
                            taken.add(bb)
                            ms_l.append(a)
                            md_l.append(bb)
                    ms = np.array(ms_l, dtype=np.int64)
                    md = np.array(md_l, dtype=np.int64)
                use_two_hop = two_hop is True or (
                    two_hop == "auto" and hub_starved
                )
                if use_two_hop:
                    ths, thd = two_hop_np(s, d, ms, md)
                    ms = np.concatenate([ms, ths])
                    md = np.concatenate([md, thd])
                if len(ms) == 0:
                    break
                # contract: matched pair -> min(pair), unmatched -> self
                least = np.minimum(ms, md)
                sorted_ids = np.sort(vs_ids)
                sup_map = sorted_ids.copy()
                sup_map[np.searchsorted(sorted_ids, ms)] = least
                sup_map[np.searchsorted(sorted_ids, md)] = least
                sup_of_entry = sup_map[
                    np.searchsorted(sorted_ids, sup_of_entry)
                ]
                v_sup = sup_map[np.searchsorted(sorted_ids, vs_ids)]
                new_ids, inv = np.unique(v_sup, return_inverse=True)
                new_size = np.zeros(len(new_ids), dtype=np.int64)
                np.add.at(new_size, inv, vs_size)
                es_sup = sup_map[np.searchsorted(sorted_ids, s)]
                ed_sup = sup_map[np.searchsorted(sorted_ids, d)]
                lo = np.minimum(es_sup, ed_sup)
                hi = np.maximum(es_sup, ed_sup)
                keep = lo < hi
                if keep.any():
                    pairs = np.unique(
                        np.stack([lo[keep], hi[keep]], axis=1), axis=0
                    )
                    s, d = pairs[:, 0].copy(), pairs[:, 1].copy()
                else:
                    s = d = _empty
                vs_ids, vs_size = new_ids, new_size
                lvl_cur += 1

            if len(vs_ids) > max_batch:
                return pd.DataFrame(
                    {
                        "v": entry,
                        "final": sup_of_entry,
                        "part": np.full(len(entry), -1, dtype=np.int32),
                    }
                )

            # greedy least-loaded packing, size desc / super asc — the
            # same heap loop `assign` runs in the distributed path
            order = np.lexsort((vs_ids, -vs_size))
            heap = [(0, p) for p in range(k)]
            heapq.heapify(heap)
            part_of: dict = {}
            for i in order:
                load, pt = heapq.heappop(heap)
                part_of[int(vs_ids[i])] = pt
                heapq.heappush(heap, (load + int(vs_size[i]), pt))
            parts = np.fromiter(
                (part_of[int(x)] for x in sup_of_entry),
                dtype=np.int32,
                count=len(entry),
            )
            return pd.DataFrame(
                {"v": entry, "final": sup_of_entry, "part": parts}
            )

        def wrapped(key, vp, ep):
            return local_finish(vp, ep)

        out = (
            vb.groupBy("__g")
            .cogroup(eb.groupBy("__g"))
            .applyInPandas(wrapped, "v long, final long, part int")
            .localCheckpoint()
        )
        if not out.filter(F.col("part") < 0).isEmpty():
            n_coarse = out.select("final").distinct().count()
            raise ValueError(
                f"coarsening stalled at {n_coarse} supervertices "
                f"(> max_batch={self.max_batch}); the residue has no "
                "matchable edges — partition components separately or "
                "raise max_batch"
            )
        return comp.join(
            F.broadcast(out.withColumnRenamed("v", "super")), on="super"
        ).select(ID, "part", F.col("final").alias("super"))

    def _pack_and_project(
        self, comp: DataFrame, sizes: DataFrame
    ) -> DataFrame:
        """Greedy least-loaded bin packing of the coarsest level in one
        bounded Arrow batch, then label projection — the distributed
        path's tail (the batched path replays the identical heap loop
        inside its kernel)."""
        k = self.k

        def assign(pdf):
            import heapq

            pdf = pdf.sort_values(
                ["size", "super"], ascending=[False, True]
            ).reset_index(drop=True)
            heap = [(0, p) for p in range(k)]
            heapq.heapify(heap)
            parts = []
            for size in pdf["size"]:
                load, p = heapq.heappop(heap)
                parts.append(p)
                heapq.heappush(heap, (load + int(size), p))
            pdf["part"] = parts
            return pdf[["super", "part"]]

        assigned = (
            sizes.withColumn("__g", F.lit(0))
            .groupBy("__g")
            .applyInPandas(assign, "super long, part int")
        )
        return comp.join(F.broadcast(assigned), on="super").select(
            ID, "part", "super"
        )


def _refine_batched(
    g: Graph,
    cur: DataFrame,
    k: int,
    cap_df: "DataFrame | None",
    cap_const: "int | None",
    rounds: int,
    seed: int,
) -> DataFrame:
    """Whole-refinement Arrow batch below ``refine``'s ``batch_finish``
    bound: every round's neighbor-weight scoring, best-part selection,
    Luby independence thinning and per-part intake capping replays the
    distributed arithmetic bit for bit — the same
    ``xxhash64(id, seed+round)`` priorities (NumPy replica, pinned by
    tests/test_xxh64_np.py), the same (gain, hash, id) domination key,
    the same (gain desc, hash asc, id asc) intake ranking against the
    same double-compared cap. Pinned batched == distributed by
    tests/test_refine_batch.py."""
    verts = cur
    if cap_df is not None:
        verts = verts.crossJoin(F.broadcast(cap_df))
    else:
        verts = verts.withColumn(
            "__cap", F.lit(float(cap_const)).cast("double")
        )
    part_type = cur.schema["part"].dataType.simpleString()
    vrows = verts.select(
        F.col(ID).alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.col("part").cast("long").alias("part"),
        F.col("__cap").alias("__cap"),
        F.lit(1).alias("__m"),
    )
    erows = g.edges.select(
        F.col(SRC).cast("long").alias("a"),
        F.col(DST).cast("long").alias("b"),
        F.lit(0).cast("long").alias("part"),
        F.lit(0.0).cast("double").alias("__cap"),
        F.lit(0).alias("__m"),
    )

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        from pyspark_graph_spark.functions.xxh64_np import xxhash64_long_int

        m = pdf["__m"].to_numpy()
        a = pdf["a"].to_numpy().astype(np.int64, copy=False)
        b = pdf["b"].to_numpy().astype(np.int64, copy=False)
        vids = a[m == 1].copy()
        part = pdf["part"].to_numpy().astype(np.int64, copy=False)[
            m == 1
        ].copy()
        caps = pdf["__cap"].to_numpy()[m == 1]
        cap_val = float(caps[0]) if len(caps) else 0.0
        es_raw, ed_raw = a[m == 0], b[m == 0]

        order = np.argsort(vids, kind="stable")
        vids_s = vids[order]
        part_s = part[order]
        n = len(vids_s)

        def to_idx(x):
            i = np.searchsorted(vids_s, x)
            ok = (i < n) & (vids_s[np.minimum(i, max(n - 1, 0))] == x)
            return i, ok

        si, sok = to_idx(es_raw)
        di, dok = to_idx(ed_raw)
        keep = sok & dok  # edges with a foreign endpoint never reach a
        # join with `cur` in the distributed shape — drop identically
        es, ed = si[keep], di[keep]
        # symmetrize once: each input edge contributes both directions,
        # exactly like the unionByName sym frame
        u_all = np.concatenate([es, ed])
        v_all = np.concatenate([ed, es])

        for r in range(rounds):
            w = np.zeros((n, k), dtype=np.int64)
            np.add.at(w, (u_all, part_s[v_all]), 1)
            rows = np.arange(n)
            w_own = w[rows, part_s]
            w_masked = w.copy()
            w_masked[rows, part_s] = -1  # own part never competes
            to = np.argmax(w_masked, axis=1).astype(np.int64)  # first
            # max = smallest q, matching min(struct(-w, q))
            w_best = w_masked[rows, to]
            is_cand = w_best > w_own
            if not is_cand.any():
                break
            gain = np.where(is_cand, w_best - w_own, np.int64(0))
            h = xxhash64_long_int(vids_s, seed + r)
            # Luby: candidate u dominated by adjacent candidate v with a
            # strictly greater (gain, h, id) key
            cu, cv = u_all, v_all
            both = is_cand[cu] & is_cand[cv]
            cu, cv = cu[both], cv[both]
            kg_u, kg_v = gain[cu], gain[cv]
            kh_u, kh_v = h[cu], h[cv]
            ki_u, ki_v = vids_s[cu], vids_s[cv]
            gt = (kg_v > kg_u) | (
                (kg_v == kg_u)
                & ((kh_v > kh_u) | ((kh_v == kh_u) & (ki_v > ki_u)))
            )
            dominated = np.zeros(n, dtype=bool)
            dominated[cu[gt]] = True
            indep = is_cand & ~dominated
            if not indep.any():
                # no movers survive: the distributed round still ran (cand
                # was non-empty) and applied zero moves; continue
                continue
            sizes = np.bincount(part_s, minlength=k).astype(np.int64)
            idx = np.flatnonzero(indep)
            # rank per target part by (gain desc, h asc, id asc)
            ordr = np.lexsort((vids_s[idx], h[idx], -gain[idx], to[idx]))
            idx_o = idx[ordr]
            to_o = to[idx_o]
            newg = np.ones(len(idx_o), dtype=bool)
            newg[1:] = to_o[1:] != to_o[:-1]
            starts = np.flatnonzero(newg)
            gidx = np.cumsum(newg) - 1
            rk = np.arange(len(idx_o)) - starts[gidx] + 1
            load = rk + sizes[to_o]
            ok = load.astype(np.float64) <= cap_val
            movers = idx_o[ok]
            part_s = part_s.copy()
            part_s[movers] = to[movers]
        return pd.DataFrame({ID: vids_s, "part": part_s})

    return (
        vrows.unionByName(erows)
        .withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(kernel, f"{ID} long, part long")
        .select(ID, F.col("part").cast(part_type).alias("part"))
    )


def refine(
    g: Graph,
    parts: DataFrame,
    k: int,
    cap: "int | DataFrame",
    rounds: int = 2,
    seed: int = 0,
    batch_finish: int = 1_000_000,
) -> DataFrame:
    """Boundary refinement with PROVABLE monotone cut improvement — the
    FM-flavored quality pass on top of MultilevelPartition.

    Per round: every vertex scores each part by neighbor count; positive-
    gain candidates (best other part beats own part) are thinned to a
    Luby-style independent set — a candidate survives only if no NEIGHBOR
    candidate carries a strictly greater (gain, hash, id) key — and then
    capped per target part so no part exceeds ``cap`` vertices. Because
    accepted movers are pairwise non-adjacent, each move's gain is exact
    against the frozen assignment of its neighbors and gains are additive:
    the cut strictly decreases by the sum of accepted gains, every round,
    by construction (the gate query pins cut_after <= cut_before as a
    zero-defect invariant, alongside balance <= cap and assignment
    totality).

    All steps are vertex- or part-keyed joins/aggregates; the only
    windows are partitioned by target part (k partitions of candidate
    movers). No driver-side state beyond the round loop.

    ``k`` is validated against the incoming assignment (every label must
    be non-NULL and lie in [0, k)) — a mismatched k/parts pair raises
    instead of being silently accepted, since balance below comes
    entirely from ``cap``. The check runs on the checkpointed frame so
    it scans materialized rows instead of re-executing the caller's
    (possibly expensive, unpersisted) partitioning lineage twice.

    ``batch_finish`` (round 12, guide §2.4): when both the assignment
    and the edge list fit the bound (two count probes on checkpointed /
    caller frames), ALL rounds run inside one cogrouped Arrow batch
    (``_refine_batched``) that replays the distributed arithmetic bit
    for bit — at gate scale the distributed shape cost ~2 checkpoints +
    1 probe + a windowed rank per round in fixed-overhead jobs. The
    distributed loop remains the only path above the bound (0 disables).
    """
    # cap may be a 1-row DataFrame (single numeric column) so callers can
    # derive the balance bound distributively, with no driver collect
    cap_df = (
        cap.select(F.col(cap.columns[0]).cast("double").alias("__cap"))
        if isinstance(cap, DataFrame)
        else None
    )
    sym = g.edges.select(SRC, DST).unionByName(
        g.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    cur = parts.select(ID, "part").localCheckpoint()
    bad = cur.filter(
        F.col("part").isNull()
        | (F.col("part") < 0)
        | (F.col("part") >= k)
    ).limit(1)
    if not bad.isEmpty():
        raise ValueError(
            f"parts carries NULL labels or labels outside [0, {k}) — "
            "k disagrees with the assignment being refined"
        )
    # Duplicate vertex ids would fan out through every join below
    # (neighbor weights, movers, size counts), silently voiding the
    # monotone-cut and cap invariants this function advertises as
    # provable — one aggregate on the already-checkpointed frame
    # (round-5 ADVICE).
    dup = (
        cur.groupBy(ID)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
    )
    if not dup.isEmpty():
        raise ValueError(
            "parts carries duplicate vertex ids — the assignment must "
            "have exactly one row per vertex"
        )
    if (
        batch_finish
        and -(2**31) <= seed <= 2**31 - 1 - rounds  # int-literal hash replica
        and cur.count() <= batch_finish
        and g.edges.count() <= batch_finish
    ):
        return _refine_batched(
            g,
            cur,
            k,
            cap_df,
            None if cap_df is not None else cap,
            rounds,
            seed,
        )
    for r in range(rounds):
        nw = (
            sym.join(
                cur.select(
                    F.col(ID).alias(DST), F.col("part").alias("q")
                ),
                on=DST,
            )
            .groupBy(F.col(SRC).alias(ID), "q")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        own = (
            cur.join(
                nw.withColumnRenamed("q", "part"),
                on=[ID, "part"],
                how="left",
            )
            .select(ID, "part", F.coalesce("w", F.lit(0)).alias("w_own"))
        )
        best = (
            nw.join(cur, on=ID)
            .filter(F.col("q") != F.col("part"))
            .groupBy(ID)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("w")).alias("__nw"), F.col("q").alias("to")
                    )
                ).alias("__b")
            )
            .select(
                ID,
                F.col("__b.to").alias("to"),
                (-F.col("__b.__nw")).alias("w_best"),
            )
        )
        cand = (
            own.join(best, on=ID)
            .filter(F.col("w_best") > F.col("w_own"))
            .select(
                ID,
                "part",
                "to",
                (F.col("w_best") - F.col("w_own")).alias("gain"),
                F.xxhash64(F.col(ID), F.lit(seed + r)).alias("__h"),
            )
            .localCheckpoint()
        )
        if cand.isEmpty():
            break
        # Luby selection: drop any candidate with a neighbor candidate of
        # strictly greater key — survivors are pairwise non-adjacent
        key = F.struct("gain", "__h", ID)
        left = cand.select(F.col(ID).alias(SRC), key.alias("__kl"))
        right = cand.select(F.col(ID).alias(DST), key.alias("__kr"))
        dominated = (
            sym.join(left, on=SRC)
            .join(right, on=DST)
            .filter(F.col("__kr") > F.col("__kl"))
            .select(F.col(SRC).alias(ID))
            .distinct()
        )
        indep = cand.join(dominated, on=ID, how="anti")
        # intake cap per target part (departures only free space next round)
        sizes = cur.groupBy(F.col("part").alias("to")).agg(
            F.count(F.lit(1)).alias("__sz")
        )
        from pyspark.sql import Window

        ranked = indep.join(sizes, on="to", how="left").withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("to").orderBy(
                    F.desc("gain"), F.asc("__h"), F.asc(ID)
                )
            ),
        )
        load = F.col("__rk") + F.coalesce("__sz", F.lit(0))
        if cap_df is not None:
            moves = (
                ranked.crossJoin(F.broadcast(cap_df))
                .filter(load.cast("double") <= F.col("__cap"))
                .select(ID, F.col("to").alias("__new"))
            )
        else:
            moves = ranked.filter(load <= F.lit(cap)).select(
                ID, F.col("to").alias("__new")
            )
        cur = (
            cur.join(moves, on=ID, how="left")
            .select(ID, F.coalesce("__new", F.col("part")).alias("part"))
            .localCheckpoint()
        )
    return cur


def partition_report(g: Graph, parts: DataFrame) -> DataFrame:
    """One-row audit of a (id, part) assignment against its defining
    invariants — the distributable recomputation the gate oracle pins:

    - ``assign_defect``: vertices with zero or duplicate part labels
    - ``k_defect``: labels outside [0, k) where k = distinct labels used
      is NOT checked here (k is the caller's parameter); this counts
      negative labels only, as a sanity floor
    - ``balance_defect``: parts exceeding Graham's list-scheduling bound
      total/k_used + max_part_item is not recomputable without item
      sizes, so the caller-facing bound uses the coarsest supervertex
      sizes — see the gate query, which computes it inline
    - ``cut_edges``: edges crossing parts (reported, not pinned)
    """
    per = parts.groupBy(ID).agg(F.count(F.lit(1)).alias("c"))
    assign_defect = (
        g.vertices.select(ID)
        .join(per, on=ID, how="left")
        .filter(F.coalesce("c", F.lit(0)) != 1)
        .agg(F.count(F.lit(1)).alias("assign_defect"))
    )
    neg = parts.filter(F.col("part") < 0).agg(
        F.count(F.lit(1)).alias("k_defect")
    )
    cut = (
        g.edges.select(SRC, DST)
        .join(
            parts.withColumnsRenamed({ID: SRC, "part": "__ps"}), on=SRC
        )
        .join(
            parts.withColumnsRenamed({ID: DST, "part": "__pd"}), on=DST
        )
        .filter(F.col("__ps") != F.col("__pd"))
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    return assign_defect.crossJoin(neg).crossJoin(cut)
