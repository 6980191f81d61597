"""Relational operator layer — the OGR SQL dialect analog on Ray Data.

Reference semantics: attribute filters / expression engine (ogr/swq.cpp,
ogr/swq_op_registrar.cpp:28-62), summary aggregates COUNT/MIN/MAX/AVG/
SUM (ogr/ogrsf_frmts/generic/ogr_gensql.cpp:849 PrepareSummary), ORDER
BY index (ogr_gensql.cpp:2201), DISTINCT (ogr/ogr_swq.h:382), UNION
layer (ogrunionlayer.h), attribute equi-join (ogr_gensql.cpp:1319).
The engine is a strict superset: keyed GROUP BY (the generic OGR
dialect has none — SURVEY.md §2.5) and distributed execution.

Key scale pattern: ``grouped_aggregate`` pre-aggregates inside
map_batches (pyarrow group_by per batch -> one partial row per key per
batch) before the wide groupby, so the shuffle moves partials, not
rows (ray_guide 'Aggregation at scale').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

_PARTIAL_OPS = {"sum", "count", "min", "max", "mean"}


def grouped_aggregate(ds, keys: list[str], specs: list[tuple[str, str, str]]):
    """GROUP BY ``keys`` with aggregates ``(col, op, alias)``.

    op in {sum, count, min, max, mean}; ``count`` counts all rows of the
    group (COUNT(*)).  Partial aggregation per batch, tiny final shuffle.
    Output columns: keys + aliases (mean emitted as float64; like SQL
    AVG it divides by the column's NON-NULL count, not the group size).
    """
    for _, op, _ in specs:
        if op not in _PARTIAL_OPS:
            raise ValueError(f"unsupported op {op}")

    # per-batch partial: pyarrow hash aggregation
    pa_aggs = [("__one", "sum")]
    for col, op, alias in specs:
        if op == "count":
            continue
        if op == "mean":
            pa_aggs.append((col, "sum"))
            pa_aggs.append((col, "count"))  # non-null count for AVG
        else:
            pa_aggs.append((col, op))
    pa_aggs = list(dict.fromkeys(pa_aggs))

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("__one", pa.array(np.ones(t.num_rows, dtype=np.int64)))
        return t.group_by(keys).aggregate(pa_aggs)

    part = ds.map_batches(partial, batch_format="pyarrow")

    # final merge over partials
    ray_aggs = [Sum("__one_sum", alias_name="__n")]
    seen = set()
    for col, op, alias in specs:
        if op == "count":
            continue
        src = f"{col}_sum" if op in ("sum", "mean") else f"{col}_{op}"
        if op == "mean" and f"{col}_count" not in seen:
            seen.add(f"{col}_count")
            ray_aggs.append(Sum(f"{col}_count", alias_name=f"{col}_count"))
        if src in seen:
            continue
        seen.add(src)
        if op in ("sum", "mean"):
            ray_aggs.append(Sum(src, alias_name=src))
        elif op == "min":
            ray_aggs.append(Min(src, alias_name=src))
        elif op == "max":
            ray_aggs.append(Max(src, alias_name=src))
    merged = part.groupby(keys).aggregate(*ray_aggs)

    def finalize(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        for col, op, alias in specs:
            if op == "count":
                cols[alias] = t.column("__n")
            elif op == "sum":
                cols[alias] = t.column(f"{col}_sum")
            elif op == "mean":
                # SQL AVG: sum over the NON-NULL count (an all-NULL
                # group has a NULL sum, so the result stays NULL; the
                # max(count,1) only dodges the 0/0 in that dead lane)
                cnt = pc.max_element_wise(
                    pc.cast(t.column(f"{col}_count"), pa.float64()),
                    pa.scalar(1.0, pa.float64()),
                )
                cols[alias] = pc.divide(
                    pc.cast(t.column(f"{col}_sum"), pa.float64()), cnt
                )
            else:
                cols[alias] = t.column(f"{col}_{op}")
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def global_aggregate(ds, specs: list[tuple[str, str, str]]):
    """Ungrouped summary record (the SWQM_SUMMARY_RECORD analog)."""
    tagged = ds.map_batches(
        lambda t: t.append_column("__g", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    out = grouped_aggregate(tagged, ["__g"], specs)
    return out.drop_columns(["__g"])


def filter_expr(ds, expression):
    """Vectorized attribute filter: pyarrow.compute expression applied
    per batch (WHERE clause analog; the generic OGR dialect's operator
    set maps onto pc kernels, swq_op_registrar.cpp:28-62)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(expression)

    fn.__name__ = "filter_expr"
    return ds.map_batches(fn, batch_format="pyarrow")


def distinct(ds, cols: list[str], num_partitions: int = 32):
    """SELECT DISTINCT cols (SWQM_DISTINCT_LIST analog): one partial
    dedup before the shuffle, then groupby a HASH PART of the key
    columns with a vectorized Arrow group_by dedup inside each
    partition — NOT groupby(cols).map_groups(first), which costs one
    Python call per distinct value."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols).group_by(cols).aggregate([])
        h = np.zeros(t.num_rows, np.uint64)
        for c in cols:
            col = t.column(c)
            if pa.types.is_integer(col.type):
                v = pc.cast(col, pa.int64()).to_numpy(
                    zero_copy_only=False
                ).astype(np.uint64)
            else:
                import zlib

                v = np.array(
                    [zlib.crc32(s.encode()) if s is not None else 0
                     for s in pc.cast(col, pa.string()).to_pylist()],
                    np.uint64,
                )
            h = h * np.uint64(1000003) + v
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        return t.append_column(
            "__dpart",
            pa.array((h % np.uint64(num_partitions)).astype(np.int64),
                     pa.int64()),
        )

    def part_distinct(g: pa.Table) -> pa.Table:
        return g.select(cols).group_by(cols).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__dpart")
        .map_groups(part_distinct, batch_format="pyarrow")
    )


def order_by_limit(ds, keys, descending=False, limit: int | None = None):
    """ORDER BY + LIMIT (top-k when limit given): per-batch local top-k
    prune before the distributed sort, then sort + limit."""
    if limit is not None:

        def local_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= limit:
                return t
            sort_keys = [
                (k, "descending" if d else "ascending")
                for k, d in zip(keys, _desc_list(keys, descending))
            ]
            idx = pc.sort_indices(t, sort_keys=sort_keys)[:limit]
            return t.take(idx)

        ds = ds.map_batches(local_topk, batch_format="pyarrow")
    out = ds.sort(keys, descending=descending)
    if limit is not None:
        out = out.limit(limit)
    return out


def _desc_list(keys, descending):
    if isinstance(descending, bool):
        return [descending] * len(keys)
    return list(descending)


def broadcast_hash_join(left, right_table: pa.Table, on: str, how: str = "inner"):
    """Small-side broadcast equi-join: ray.put the build table once,
    Arrow-native probe per batch (no shuffle; ogr_gensql.cpp:1319
    secondary-table fetch analog).

    The build side is key-sorted ONCE at plan time (unique keys +
    run offsets), so each probe batch is one ``pc.index_in`` against
    the broadcast key set plus two vectorized takes — the probe stream
    never leaves Arrow (the prior pandas merge round-tripped every
    left batch through pandas).  Row order: left order preserved,
    multi-matches expand in build-side key-sorted order.  Colliding
    right column names take the ``_r`` suffix (copartition_equi_join
    convention)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_hash_join: unsupported how={how!r}")
    rs = right_table.sort_by(on)
    rkeys = rs.column(on)
    if rs.num_rows:
        kv = rkeys.to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], kv[1:] != kv[:-1]])
        starts = np.flatnonzero(new).astype(np.int64)
        counts = np.diff(np.append(starts, len(kv))).astype(np.int64)
        uniq = rkeys.take(pa.array(starts, pa.int64()))
    else:
        starts = np.array([], np.int64)
        counts = np.array([], np.int64)
        uniq = rkeys
    right_payload = rs.drop_columns([on])
    ref = ray.put((uniq, starts, counts, right_payload))

    def fn(t: pa.Table) -> pa.Table:
        uniq, starts, counts, payload = ray.get(ref)
        pos = pc.index_in(t.column(on), value_set=uniq)
        pos_np = pos.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        match = pos_np >= 0
        if how == "inner":
            lrows = np.flatnonzero(match)
            m = pos_np[lrows]
            rep = counts[m]
            left_take = np.repeat(lrows, rep)
            base = np.repeat(starts[m], rep)
            csum = np.cumsum(rep) - rep
            offs = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(csum, rep)
            right_idx = pa.array(base + offs, pa.int64())
        else:  # left outer: unmatched rows emit once with null right side
            pos_safe = np.where(match, pos_np, 0)
            counts_g = counts if len(counts) else np.zeros(1, np.int64)
            starts_g = starts if len(starts) else np.zeros(1, np.int64)
            rep_full = np.where(match, counts_g[pos_safe], 1).astype(np.int64)
            left_take = np.repeat(np.arange(len(t), dtype=np.int64), rep_full)
            base = np.repeat(np.where(match, starts_g[pos_safe], 0), rep_full)
            csum = np.cumsum(rep_full) - rep_full
            offs = (np.arange(int(rep_full.sum()), dtype=np.int64)
                    - np.repeat(csum, rep_full))
            ridx = base + offs
            rmask = np.repeat(~match, rep_full)  # True -> null index
            right_idx = pa.array(ridx, pa.int64(), mask=rmask)
        out = t.take(pa.array(left_take, pa.int64()))
        lnames = set(out.column_names)
        for name in payload.column_names:
            col = payload.column(name).take(right_idx)
            out = out.append_column(
                name + "_r" if name in lnames else name, col
            )
        return out

    fn.__name__ = f"broadcast_join_{on}"
    return left.map_batches(fn, batch_format="pyarrow")


def hash_join(left, right, on: str, num_partitions: int = 32, how: str = "inner"):
    """Both-sides-large equi-join: Ray Data native hash-partitioned join."""
    return left.join(
        right, join_type=how, num_partitions=num_partitions, on=(on,),
        right_suffix="_r",
    )


def copartition_equi_join(
    left,
    right,
    lkey: str,
    rkey: str,
    how: str = "inner",
    num_partitions: int = 16,
    right_suffix: str = "_r",
    left_schema: list[tuple] | None = None,
    right_schema: list[tuple] | None = None,
):
    """Equi-join via explicit co-partitioning: tag sides, union, ONE
    groupby(hash(key) % P) shuffle, then a local Arrow (acero) hash
    join inside each partition group.

    Same plan shape as ``Dataset.join``'s hash shuffle, but robust to
    sparse key domains: the native join's finalizer loses the schema of
    empty hash partitions (``ArrowInvalid: No match ... for key field``
    when a filtered side covers few hash residues), while groups here
    only exist where rows exist and every emitted block carries the
    full joined schema.  Matches Dataset.join naming semantics: right
    key column dropped, colliding right columns suffixed.
    """
    import numpy as np

    # schemas: explicit beats inferred (a lazy upstream whose sampled
    # block is empty reports schema None)
    # copy: callers may mutate their schema lists after this (lazy) call
    def _pa_type(ty):
        """Datasets over pandas blocks report numpy dtypes / python
        classes; normalize everything to pyarrow DataTypes."""
        if isinstance(ty, pa.DataType):
            return ty
        try:
            import numpy as _np

            dt = _np.dtype(ty)
            if dt == object:
                return pa.string()
            return pa.from_numpy_dtype(dt)
        except (TypeError, ValueError, pa.ArrowNotImplementedError):
            return pa.string()

    lsch = [(c, _pa_type(t)) for c, t in (
        left_schema if left_schema else
        zip(left.schema().names, left.schema().types))]
    rsch = [(c, _pa_type(t)) for c, t in (
        right_schema if right_schema else
        zip(right.schema().names, right.schema().types))]
    lcols = [c for c, _ in lsch]
    rcols = [c for c, _ in rsch]

    def _part_of(col) -> np.ndarray:
        ty = col.type
        if pa.types.is_integer(ty):
            c = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
            c = c.astype(np.uint64)
            c = (c ^ (c >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            c = c ^ (c >> np.uint64(33))
            return (c % np.uint64(num_partitions)).astype(np.int64)
        import zlib

        vals = pc.cast(col, pa.string()).to_pylist()
        return np.array(
            [zlib.crc32(v.encode()) % num_partitions if v is not None else 0
             for v in vals],
            np.int64,
        )

    def _tag(keycol: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {
                "__side": pa.array(np.full(t.num_rows, side, np.int8)),
                "__jpart": pa.array(_part_of(t.column(keycol)), pa.int64()),
            }
            for c, ty in lsch:
                cols[c] = (
                    t.column(c) if side == 0 else pa.nulls(t.num_rows, ty)
                )
            for c, ty in rsch:
                cols[f"__r_{c}"] = (
                    t.column(c) if side == 1 else pa.nulls(t.num_rows, ty)
                )
            return pa.table(cols)

        return fn

    both = left.map_batches(_tag(lkey, 0), batch_format="pyarrow").union(
        right.map_batches(_tag(rkey, 1), batch_format="pyarrow")
    )
    jt = {"inner": "inner", "left_outer": "left outer",
          "semi": "left semi", "anti": "left anti"}[how]

    def part_join(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(lcols)
        rt = g.filter(pa.array(side == 1)).select(
            [f"__r_{c}" for c in rcols]
        ).rename_columns(rcols)
        return lt.join(
            rt,
            keys=[lkey],
            right_keys=[rkey],
            join_type=jt,
            left_suffix="",
            right_suffix=right_suffix,
        )

    return both.groupby("__jpart").map_groups(part_join, batch_format="pyarrow")


def asof_join(
    left,
    right,
    on: str,
    by: str,
    how: str = "inner",
    tolerance=None,
    right_suffix: str = "_r",
    num_partitions: int = 16,
    left_schema: list[tuple] | None = None,
    right_schema: list[tuple] | None = None,
):
    """Distributed backward as-of join: each left row matches the right
    row with the same ``by`` key and the greatest ``on`` value <= the
    left's (inclusive; DuckDB ``ASOF JOIN ... ON l.by = r.by AND
    l.on >= r.on`` semantics), optionally within ``tolerance``.

    Not present in the reference (SURVEY §2.4 "as-of / range joins") —
    an engine addition for event/feature alignment at scale.  Plan: tag
    both sides, union, ONE groupby(hash(by) % P) shuffle, then a fully
    vectorized per-partition merge: right rows lexsorted by (by, on),
    both sides' on-values rank-encoded against their union so a single
    ``searchsorted`` over the composite (key_run, on_rank) locates
    every left row's predecessor at once — no per-key Python loop.

    Output: left columns + right columns except ``by``/``on``
    (collisions suffixed); ``how='inner'`` drops unmatched left rows,
    ``'left_outer'`` null-fills them.  NULL keys / NULL on-values never
    match (SQL comparison semantics)."""
    if how not in ("inner", "left_outer"):
        raise ValueError("asof_join how must be inner|left_outer")

    def _schema(ds, given):
        if given:
            return list(given)
        return list(zip(ds.schema().names, ds.schema().types))

    lsch = _schema(left, left_schema)
    rsch = _schema(right, right_schema)
    lcols = [c for c, _ in lsch]
    rcols = [c for c, _ in rsch]
    if by not in lcols or by not in rcols or on not in lcols or on not in rcols:
        raise ValueError(f"asof_join: {by!r}/{on!r} must exist on both sides")
    r_out = [c for c in rcols if c not in (by, on)]
    out_names = {c: (c + right_suffix if c in lcols else c) for c in r_out}

    def _key_part(col) -> np.ndarray:
        c = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        c = c.astype(np.uint64)
        c = (c ^ (c >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        c = c ^ (c >> np.uint64(33))
        return (c % np.uint64(num_partitions)).astype(np.int64)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            valid = pc.and_(
                pc.is_valid(t.column(by)), pc.is_valid(t.column(on))
            )
            if side == 1 or how == "inner":
                # NULL keys/on never match; for left_outer keep them on
                # the left so they can null-fill
                if side == 1:
                    t = t.filter(valid)
            cols = {
                "__side": pa.array(np.full(t.num_rows, side, np.int8)),
                "__jpart": pa.array(_key_part(t.column(by)), pa.int64()),
            }
            for c, ty in lsch:
                cols[c] = t.column(c) if side == 0 else pa.nulls(t.num_rows, ty)
            for c, ty in rsch:
                cols[f"__r_{c}"] = (
                    t.column(c) if side == 1 else pa.nulls(t.num_rows, ty)
                )
            return pa.table(cols)

        return fn

    both = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )

    def part_asof(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(lcols)
        rt = g.filter(pa.array(side == 1)).select(
            [f"__r_{c}" for c in rcols]
        ).rename_columns(rcols)
        lk = lt.column(by).to_numpy(zero_copy_only=False)
        lo = lt.column(on).to_numpy(zero_copy_only=False)
        rk = rt.column(by).to_numpy(zero_copy_only=False)
        ro = rt.column(on).to_numpy(zero_copy_only=False)
        lvalid = (
            pc.and_(pc.is_valid(lt.column(by)), pc.is_valid(lt.column(on)))
            .to_numpy(zero_copy_only=False)
        )
        n_l, n_r = len(lk), len(rk)
        if n_l == 0:
            pos = np.empty(0, np.int64)
            matched = np.empty(0, bool)
            order = np.empty(0, np.int64)
        elif n_r == 0:
            pos = np.full(n_l, -1, np.int64)
            matched = np.zeros(n_l, bool)
            order = np.empty(0, np.int64)
        else:
            order = np.lexsort((ro, rk))
            rk_s, ro_s = rk[order], ro[order]
            uk = np.unique(rk_s)
            # rank-encode on-values over the union of both sides so the
            # composite (key_slot, rank) is a single sortable int64
            lk_f = np.where(lvalid, lk, rk_s[0])
            lo_f = np.where(lvalid, lo, ro_s[0])
            all_t = np.unique(np.concatenate([ro_s, lo_f]))
            M = len(all_t) + 1
            comp_r = (
                np.searchsorted(uk, rk_s) * M + np.searchsorted(all_t, ro_s)
            )
            ki = np.searchsorted(uk, lk_f)
            has = (ki < len(uk))
            ki_c = np.minimum(ki, len(uk) - 1)
            has &= uk[ki_c] == lk_f
            comp_l = ki_c * M + np.searchsorted(all_t, lo_f)
            pos = np.searchsorted(comp_r, comp_l, side="right") - 1
            matched = has & lvalid & (pos >= 0)
            pos_c = np.maximum(pos, 0)
            matched &= rk_s[pos_c] == lk_f
            if tolerance is not None:
                def _num(a):
                    # datetime64 -> int64 ticks (tolerance in the same
                    # unit, e.g. microseconds for timestamp[us])
                    return a.view("i8") if a.dtype.kind in "mM" else a

                delta = _num(lo_f) - _num(ro_s[pos_c])
                matched &= delta <= tolerance
        if how == "inner":
            lt = lt.filter(pa.array(matched))
            take_idx = pa.array(
                order[pos[matched]] if len(order) else
                np.empty(0, np.int64),
                pa.int64(),
            )
        else:
            if len(order):
                idx = np.where(matched, order[np.maximum(pos, 0)], -1)
            else:  # no right rows in this partition: all null-fill
                idx = np.full(len(matched), -1, np.int64)
            take_idx = pa.array(
                np.ma.masked_array(idx, mask=idx < 0), pa.int64()
            )
        cols = {c: lt.column(c) for c in lcols}
        for c in r_out:
            cols[out_names[c]] = rt.column(c).take(take_idx)
        return pa.table(cols)

    return both.groupby("__jpart").map_groups(
        part_asof, batch_format="pyarrow"
    )


def range_lookup_join(
    left,
    right,
    on: str,
    by: str,
    lo: str,
    hi: str,
    how: str = "inner",
    right_suffix: str = "_r",
    num_partitions: int = 16,
):
    """Validity-window (interval) lookup join: match each left row to
    the LATEST right interval of the same ``by`` key whose ``lo`` <=
    left ``on``, and keep the match only if ``on`` <= ``hi``.  Equal to
    the general interval join (``l.on BETWEEN r.lo AND r.hi``) whenever
    the intervals are non-overlapping per key — the validity-window /
    SCD-2 shape; with overlapping intervals only the latest-starting
    candidate is considered (the as-of contract, documented).  Lowers
    onto asof_join(on=lo) + a vectorized hi filter (inner) or null-out
    (left_outer) — one shuffle, no pair fan-out.  Engine addition
    (SURVEY §2.4: as-of / range joins absent from the reference)."""
    rnames = right.schema().names
    rtypes = right.schema().types
    if lo == on:
        r2, lo2 = right, lo
    else:
        if on in rnames:
            raise ValueError(
                f"right already has a column named {on!r}; rename it"
            )

        def ren(t: pa.Table, _lo=lo, _on=on) -> pa.Table:
            return t.rename_columns(
                [_on if c == _lo else c for c in t.column_names]
            )

        r2 = right.map_batches(ren, batch_format="pyarrow")
        lo2 = on
    rsch = [(on if c == lo else c, ty) for c, ty in zip(rnames, rtypes)]
    m = asof_join(
        left, r2, on=on, by=by, how=how, right_suffix=right_suffix,
        num_partitions=num_partitions, right_schema=rsch,
    )
    lnames = set(left.schema().names)
    hi_out = hi + right_suffix if hi in lnames else hi
    null_cols = [
        (c + right_suffix if c in lnames else c)
        for c in rnames
        if c not in (by, lo)
    ]

    def post(t: pa.Table) -> pa.Table:
        ok = pc.less_equal(t.column(on), t.column(hi_out))
        if how == "inner":
            return t.filter(pc.fill_null(ok, False))
        keep = pc.fill_null(ok, True)  # unmatched rows stay null-filled
        for c in null_cols:
            col = t.column(c)
            t = t.set_column(
                t.column_names.index(c), c,
                pc.if_else(keep, col, pa.nulls(t.num_rows, col.type)),
            )
        return t

    return m.map_batches(post, batch_format="pyarrow")


def interval_join(
    left,
    right,
    on: str,
    by: str | None,
    lo: str,
    hi: str,
    band: float,
    right_suffix: str = "_r",
    num_partitions: int = 32,
    max_bands: int = 1024,
):
    """General overlapping-interval join: emit EVERY (left, right) pair
    with equal ``by`` key and ``lo`` <= left ``on`` <= ``hi`` (the SQL
    ``l.on BETWEEN r.lo AND r.hi`` inner join; intervals may overlap
    arbitrarily, unlike range_lookup_join's latest-only contract).

    Partitioning: time is cut into fixed ``band``-width bands (the 1-D
    analog of the engine's spatial cells); each right interval is
    replicated into every band it touches, each left row lands in
    exactly ONE band, and the shuffle groups on hash(by, band) — so
    every qualifying pair co-locates exactly once (no dedup pass).
    Inside a partition the match is vectorized: replicas lexsorted by
    (by, band, lo), per-left candidate runs located with searchsorted,
    pairs expanded with repeat/arange, then the hi bound filtered.
    An interval spanning more than ``max_bands`` bands raises (pick a
    larger ``band``) — the replication factor is the scale knob, and a
    silent clamp would drop pairs.  ``band`` is in ``on``-units
    (microsecond ticks for timestamp columns).  ``by=None`` joins on
    the range alone (the SQL pure non-equi fallback): partitioning
    then comes entirely from the band id."""
    if band <= 0:
        raise ValueError("band must be positive")

    lsch = list(zip(left.schema().names, left.schema().types))
    rsch = list(zip(right.schema().names, right.schema().types))
    lcols = [c for c, _ in lsch]
    rcols = [c for c, _ in rsch]
    r_out = [c for c in rcols if c != by]  # by=None keeps all
    out_names = {c: (c + right_suffix if c in lcols else c) for c in r_out}

    def _ticks(col) -> np.ndarray:
        a = col.to_numpy(zero_copy_only=False)
        return a.view("i8") if a.dtype.kind in "mM" else a

    def _mix(k: np.ndarray, b: np.ndarray) -> np.ndarray:
        h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
            np.uint64
        )
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        return (h % np.uint64(num_partitions)).astype(np.int64)

    def tag_left(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t.column(on))
        if by is not None:
            valid = pc.and_(pc.is_valid(t.column(by)), valid)
        t = t.filter(valid)
        k = (pc.cast(t.column(by), pa.int64()).to_numpy(zero_copy_only=False)
             if by is not None else np.zeros(t.num_rows, np.int64))
        b = np.floor_divide(_ticks(t.column(on)), np.int64(band))
        cols = {
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__band": pa.array(b, pa.int64()),
            "__jpart": pa.array(_mix(k, b), pa.int64()),
        }
        for c, ty in lsch:
            cols[c] = t.column(c)
        for c, ty in rsch:
            cols[f"__r_{c}"] = pa.nulls(t.num_rows, ty)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t.column(lo)), pc.is_valid(t.column(hi)))
        if by is not None:
            valid = pc.and_(pc.is_valid(t.column(by)), valid)
        t = t.filter(valid)
        k = (pc.cast(t.column(by), pa.int64()).to_numpy(zero_copy_only=False)
             if by is not None else np.zeros(t.num_rows, np.int64))
        b0 = np.floor_divide(_ticks(t.column(lo)), np.int64(band))
        b1 = np.floor_divide(_ticks(t.column(hi)), np.int64(band))
        cnt = (b1 - b0 + 1).astype(np.int64)
        if (cnt > max_bands).any():
            worst = int(cnt.max())
            raise ValueError(
                f"interval spans {worst} bands (> max_bands={max_bands}); "
                f"increase band"
            )
        cnt = np.maximum(cnt, 0)
        rep = np.repeat(np.arange(t.num_rows), cnt)
        off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        bands = (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(off, cnt)
            + np.repeat(b0, cnt)
        )
        idx = pa.array(rep, pa.int64())
        cols = {
            "__side": pa.array(np.ones(len(rep), np.int8)),
            "__band": pa.array(bands, pa.int64()),
            "__jpart": pa.array(_mix(k[rep], bands), pa.int64()),
        }
        for c, ty in lsch:
            cols[c] = pa.nulls(len(rep), ty)
        for c, ty in rsch:
            cols[f"__r_{c}"] = t.column(c).take(idx)
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def part_pairs(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        empty = {c: pa.array([], lt.column(c).type) for c in lcols}
        empty.update(
            {out_names[c]: pa.array([], g.column(f"__r_{c}").type)
             for c in r_out}
        )
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table(empty)
        lk = (pc.cast(lt.column(by), pa.int64()).to_numpy(zero_copy_only=False)
              if by is not None else np.zeros(lt.num_rows, np.int64))
        lb = lt.column("__band").to_numpy(zero_copy_only=False)
        lt_on = _ticks(lt.column(on))
        rk = (pc.cast(rt.column(f"__r_{by}"), pa.int64()).to_numpy(
            zero_copy_only=False
        ) if by is not None else np.zeros(rt.num_rows, np.int64))
        rb = rt.column("__band").to_numpy(zero_copy_only=False)
        r_lo = _ticks(rt.column(f"__r_{lo}"))
        r_hi = _ticks(rt.column(f"__r_{hi}"))
        order = np.lexsort((r_lo, rb, rk))
        rk_s, rb_s, rlo_s, rhi_s = (
            rk[order], rb[order], r_lo[order], r_hi[order]
        )
        # composite rank encoding: (key, band) runs, lo position inside
        all_lo = np.unique(np.concatenate([rlo_s, lt_on]))
        M = np.int64(len(all_lo) + 1)
        kb = np.stack([rk_s, rb_s], axis=1)
        ukb, run_id = np.unique(kb, axis=0, return_inverse=True)
        run_starts = np.searchsorted(run_id, np.arange(len(ukb)))
        comp_r = run_id.astype(np.int64) * M + np.searchsorted(all_lo, rlo_s)
        lkb = np.stack([lk, lb], axis=1)
        # locate each left row's (key, band) run
        li = np.searchsorted(
            ukb.view([("k", np.int64), ("b", np.int64)]).ravel(),
            lkb.view([("k", np.int64), ("b", np.int64)]).ravel(),
        )
        has = li < len(ukb)
        li_c = np.minimum(li, len(ukb) - 1)
        has &= (ukb[li_c] == lkb).all(axis=1)
        comp_l = li_c.astype(np.int64) * M + np.searchsorted(all_lo, lt_on)
        endpos = np.searchsorted(comp_r, comp_l, side="right")
        startpos = run_starts[li_c]
        n_cand = np.where(has, endpos - startpos, 0)
        total = int(n_cand.sum())
        if total == 0:
            return pa.table(empty)
        l_rep = np.repeat(np.arange(lt.num_rows), n_cand)
        off = np.concatenate([[0], np.cumsum(n_cand)[:-1]])
        cand = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, n_cand)
            + np.repeat(startpos, n_cand)
        )
        keep = rhi_s[cand] >= lt_on[l_rep]
        l_idx = pa.array(l_rep[keep], pa.int64())
        r_idx = pa.array(order[cand[keep]], pa.int64())
        cols = {c: lt.column(c).take(l_idx) for c in lcols}
        for c in r_out:
            cols[out_names[c]] = rt.column(f"__r_{c}").take(r_idx)
        return pa.table(cols)

    return both.groupby("__jpart").map_groups(
        part_pairs, batch_format="pyarrow"
    )


def sample_hash(ds, key_col: str, frac: float):
    """Deterministic Bernoulli sampling by multiplicative key hash
    (the decimated/approx-ok sampling analog of
    gdalrasterband.cpp:4151; reproducible across runs AND expressible
    in the SQL oracle: keep rows with (key * 2654435761) % 2^32 <
    frac * 2^32)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cut = int(frac * 4294967296)

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        k = pc.cast(t.column(key_col), pa.int64()).to_numpy(zero_copy_only=False)
        h = (k * 2654435761) % 4294967296
        return t.filter(pa.array(h < cut))

    fn.__name__ = f"sample_{key_col}"
    return ds.map_batches(fn, batch_format="pyarrow")


def decimate(ds, key_col: str, n: int, keep: int = 0):
    """Keep every n-th row by key (key % n == keep) — the stride
    decimation of approx statistics / overview sampling."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        k = pc.cast(t.column(key_col), pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array((k % n) == keep))

    fn.__name__ = f"decimate_{key_col}"
    return ds.map_batches(fn, batch_format="pyarrow")


def join_auto(left, right, lkey: str, rkey: str | None = None,
              how: str = "inner", broadcast_max_rows: int = 200_000,
              num_partitions: int = 32):
    """Equi-join strategy auto-selection (SURVEY §9.6; the
    ogr_gensql.cpp:1319 secondary-table fetch picks an attribute-index
    path the same way): if the build (right) side is small, broadcast
    it once via ``ray.put`` and merge per batch — NO shuffle; else run
    the one-shuffle co-partitioned join.

    ``right.count()`` is metadata-cheap for as-read parquet datasets
    (row counts come from file footers); apply the gate before heavy
    transforms, or pass an explicit strategy via the underlying
    functions when the estimate would force an execution."""
    rkey = rkey or lkey
    n = right.count()
    if n <= broadcast_max_rows:
        tbl = _dataset_to_table(right)
        if rkey != lkey:
            idx = tbl.schema.get_field_index(rkey)
            tbl = tbl.set_column(idx, lkey, tbl.column(rkey))
        return broadcast_hash_join(left, tbl, on=lkey, how=how)
    return copartition_equi_join(
        left, right, lkey=lkey, rkey=rkey, how=how,
        num_partitions=num_partitions,
    )


def _dataset_to_table(ds) -> pa.Table:
    """Materialize a (small, gated) Dataset to one Table."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def concat_layers(dss):
    """Schema-unifying layer concat (apps/gdalalg_vector_concat.cpp
    field-unioning mode / OGRUnionLayer): the output schema is the
    ordered union of input columns; a layer's missing columns are
    null-filled with the owning layer's declared type.  Pure
    batch-level map + union — no shuffle."""
    schemas = [list(zip(d.schema().names, d.schema().types)) for d in dss]
    out_cols: list[tuple] = []
    seen: set = set()
    for sch in schemas:
        for c, ty in sch:
            if c not in seen:
                seen.add(c)
                out_cols.append((c, ty))

    def align(present: frozenset):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    c: (t.column(c) if c in present
                        else pa.nulls(t.num_rows, ty))
                    for c, ty in out_cols
                }
            )

        fn.__name__ = "concat_align"
        return fn

    parts = [
        d.map_batches(align(frozenset(c for c, _ in sch)),
                      batch_format="pyarrow")
        for d, sch in zip(dss, schemas)
    ]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
