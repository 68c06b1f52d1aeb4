"""Mergeable HLL distinct-count tiers: the merge law (union of finer
sketches == sketch of the raw slice), accuracy vs exact distinct, and
the cascade's raw-touched-once shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.sketches import (
    hll_cascade,
    hll_reaggregate,
    hll_tier,
    with_estimate,
)

SERIES = ["conv_id", "role", "tool"]


def test_merge_law_and_accuracy(spark, transcripts, transcripts_pdf):
    """(1) estimate(union of 1m sketches over each hour) ==
    estimate(sketch built directly from the hour's raw rows) -- the
    law that makes the cascade correct; (2) every estimate within 5%
    of the exact distinct count (lgK=12 ~ 1.6% RSE)."""
    t1m = hll_tier(transcripts, SERIES, "1m", "text")
    t1h_merged = with_estimate(hll_reaggregate(t1m, SERIES, "1h"))
    t1h_direct = with_estimate(hll_tier(transcripts, SERIES, "1h", "text"))
    def keyed(rows):
        return {
            (r["conv_id"], r["role"], r["tool"] or "<null>",
             r["bucket_ms"]): r["n_distinct"]
            for r in rows
        }

    m = keyed(t1h_merged.collect())
    d = keyed(t1h_direct.collect())
    assert m == d and m  # estimate-identical, nonempty

    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    exact = p.groupby(
        ["conv_id", "role", "tool", "bucket_ms"]
    )["text"].nunique()
    for k, est in m.items():
        want = int(exact.loc[k])
        assert abs(est - want) <= max(1, 0.05 * want), (k, est, want)


def test_cascade_shapes_and_monotonicity(spark, transcripts):
    """1d >= 1h >= per-bucket sanity via total distinct conservation:
    summing per-bucket estimates can only overcount vs the coarser
    union (distinct sets overlap), never undercount by more than the
    sketch error."""
    tiers = hll_cascade(transcripts, SERIES, "text")
    est_1h = with_estimate(tiers["1h"]).agg(
        F.sum("n_distinct").alias("s")
    ).first()["s"]
    est_1d = with_estimate(tiers["1d"]).agg(
        F.sum("n_distinct").alias("s")
    ).first()["s"]
    assert est_1d <= est_1h * 1.01  # union <= sum of parts (mod RSE)
    # plan shape: the 1d tier's plan contains NO scan of the raw input
    # (raw is touched once, by the 1m tier; 1d unions 1h sketches)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        tiers["1d"].explain()
    plan = buf.getvalue()
    assert plan.count("hll_union_agg") >= 1
    assert "hll_sketch_agg" in plan  # the single finest-tier build
    # raw input scanned exactly once (1m builds from raw; 1h/1d union)
    assert plan.count("LocalTableScan") == 1


def test_cms_merge_lossless_and_guarantee(spark, transcripts,
                                          transcripts_pdf):
    """Count-min law pins: (1) re-aggregated 1h sketch == the 1h sketch
    built directly from raw, CELL FOR CELL (the merge is lossless
    integer addition, unlike HLL's estimate-identity); (2) every point
    estimate >= the exact count (the one-sided count-min guarantee);
    (3) at this width/key-domain the estimates are near-exact (any
    overestimate is an all-rows hash collision -- deterministic for the
    fixed fixture+hash, bounded loosely so fixture edits don't flip
    it)."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        cms_estimate,
        cms_reaggregate,
        cms_tier,
    )

    t1m = cms_tier(transcripts, SERIES, "1m", "role")
    merged = cms_reaggregate(t1m, SERIES, "1h")
    direct = cms_tier(transcripts, SERIES, "1h", "role")

    def cells(df):
        return {
            tuple(r[c] for c in [*SERIES, "bucket_ms", "row", "slot"]):
                r["cnt"]
            for r in df.collect()
        }

    m = cells(merged)
    assert m == cells(direct) and m  # lossless merge

    keys = sorted(transcripts_pdf["role"].dropna().unique())
    est = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["bucket_ms"],
         r["key"]): r["est"]
        for r in cms_estimate(
            merged, [*SERIES, "bucket_ms"], keys
        ).collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    # within one (conv, role, tool, bucket) group every row shares the
    # group's role, so exact(key) = group size when key == role else 0
    sizes = p.groupby(["conv_id", "role", "tool", "bucket_ms"]).size()
    over = 0
    for (cid, role, tool, bms, key), e in est.items():
        want = int(sizes.get((cid, role, tool, bms))) if key == role else 0
        assert e >= want, ((cid, role, tool, bms, key), e, want)
        over += int(e != want)
    assert est and over <= max(2, len(est) // 50)


def test_cms_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for the count-min family (r9 rotation
    fuel): DuckDB recomputes the ENTIRE chain independently -- the
    row-salted hash60 slots, the 1h sketch cells, and the min-over-rows
    point estimates for a fixed probe set -- in exact BIGINTs. Lossless
    integer algebra end to end: value-hash promotable."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_estimate,
        cms_slot_sql,
        cms_tier,
    )

    t1h = cms_tier(transcripts, SERIES, "1h", "role", hasher="parity")
    got_cells = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "row", "slot"]): r["cnt"]
        for r in t1h.collect()
    }
    keys = sorted(transcripts_pdf["role"].dropna().unique())
    got_est = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "key"]): r["est"]
        for r in cms_estimate(
            t1h, [*SERIES, "bucket_ms"], keys, hasher="parity"
        ).collect()
    }

    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    key_rows = ", ".join(f"('{k}')" for k in keys)
    slot = cms_slot_sql("role", "r.row", CMS_WIDTH)
    sketch_sql = f"""
        WITH rows(row) AS (
          SELECT unnest(generate_series(0, {CMS_DEPTH - 1}))),
        cells AS (
          SELECT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 r.row::INTEGER AS row,
                 ({slot})::INTEGER AS slot,
                 count(*)::BIGINT AS cnt
          FROM transcripts, rows r
          WHERE role IS NOT NULL
          GROUP BY 1, 2, 3, 4, 5, 6)
    """
    want_cells = {
        (c, ro, t, int(b), int(rw), int(sl)): int(n)
        for c, ro, t, b, rw, sl, n in con.sql(
            sketch_sql + "SELECT * FROM cells"
        ).fetchall()
    }
    assert got_cells == want_cells and got_cells

    probe_slot = cms_slot_sql("k.key", "r.row", CMS_WIDTH)
    est_sql = sketch_sql + f""",
        keys(key) AS (SELECT * FROM (VALUES {key_rows})),
        probes AS (
          SELECT k.key, r.row::INTEGER AS row,
                 ({probe_slot})::INTEGER AS slot
          FROM keys k, rows r),
        grps AS (SELECT DISTINCT conv_id, role, tool, bucket_ms
                 FROM cells)
        SELECT g.conv_id, g.role, g.tool, g.bucket_ms, p.key,
               min(coalesce(c.cnt, 0))::BIGINT AS est
        FROM grps g CROSS JOIN probes p
        LEFT JOIN cells c
          ON c.conv_id = g.conv_id AND c.role = g.role
         AND (c.tool = g.tool OR (c.tool IS NULL AND g.tool IS NULL))
         AND c.bucket_ms = g.bucket_ms
         AND c.row = p.row AND c.slot = p.slot
        GROUP BY 1, 2, 3, 4, 5
    """
    want_est = {
        (c, ro, t, int(b), k): int(e)
        for c, ro, t, b, k, e in con.sql(est_sql).fetchall()
    }
    assert got_est == want_est and got_est


def test_cms_cascade_raw_touched_once(spark, transcripts):
    """The 1d count-min tier's plan reads the raw input exactly once
    (via the 1m build); coarser tiers are pure cell sums."""
    import io
    from contextlib import redirect_stdout

    from prom_tsdb_copyer_spark.operators.sketches import cms_cascade

    tiers = cms_cascade(transcripts, SERIES, "role")
    buf = io.StringIO()
    with redirect_stdout(buf):
        tiers["1d"].explain()
    plan = buf.getvalue()
    assert plan.count("LocalTableScan") == 1
    total_1m = tiers["1m"].agg(F.sum("cnt").alias("s")).first()["s"]
    total_1d = tiers["1d"].agg(F.sum("cnt").alias("s")).first()["s"]
    assert total_1m == total_1d  # mass conservation through the merge


def test_bloom_merge_lossless_idempotent_no_false_negatives(
    spark, transcripts, transcripts_pdf
):
    """Bloom law pins: (1) OR-merged 1h filter == the filter built
    directly from raw, bit for bit; (2) the merge is IDEMPOTENT --
    re-merging the same finer tier twice changes nothing (the property
    count-min's counter sum does NOT have); (3) membership has NO
    false negatives: every key a group actually contained probes true;
    (4) false positives bounded loosely at this m/k/key-domain."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        bloom_contains,
        bloom_reaggregate,
        bloom_tier,
    )

    t1m = bloom_tier(transcripts, SERIES, "1m", "role")
    merged = bloom_reaggregate(t1m, SERIES, "1h")
    direct = bloom_tier(transcripts, SERIES, "1h", "role")

    def bits(df):
        out = {}
        for r in df.collect():
            k = tuple(r[c] for c in [*SERIES, "bucket_ms"])
            out.setdefault(k, set()).add(r["bit"])
        return out

    m = bits(merged)
    assert m == bits(direct) and m  # lossless OR-merge
    # idempotence: union the same 1m tier in twice
    replayed = bloom_reaggregate(t1m.unionAll(t1m), SERIES, "1h")
    assert bits(replayed) == m

    keys = sorted(transcripts_pdf["role"].dropna().unique())
    got = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["bucket_ms"],
         r["key"]): r["member"]
        for r in bloom_contains(
            merged, [*SERIES, "bucket_ms"], keys
        ).collect()
    }
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    # within one (conv, role, tool, bucket) group every row shares the
    # group's role, so truth(key) = (key == role)
    false_pos = 0
    assert got
    for (cid, role, tool, bms, key), member in got.items():
        if key == role:
            assert member, (cid, role, tool, bms, key)  # no false negative
        elif member:
            false_pos += 1
    assert false_pos <= max(2, len(got) // 20)


def test_bloom_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for the Bloom family (r9 rotation fuel):
    DuckDB recomputes the ENTIRE chain independently -- the salted
    hash60 bit positions, the 1h filter's distinct-bit relation, and
    the all-k-bits membership fold for a fixed probe set -- in exact
    BIGINTs/booleans. Set algebra end to end: value-hash promotable."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_bit_sql,
        bloom_contains,
        bloom_tier,
    )

    t1h = bloom_tier(transcripts, SERIES, "1h", "role", hasher="parity")
    got_bits = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in t1h.collect()
    }
    keys = sorted(transcripts_pdf["role"].dropna().unique())
    got_member = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "key"]): r["member"]
        for r in bloom_contains(
            t1h, [*SERIES, "bucket_ms"], keys, hasher="parity"
        ).collect()
    }

    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    key_rows = ", ".join(f"('{k}')" for k in keys)
    bit = bloom_bit_sql("role", "i.i", BLOOM_BITS)
    filt_sql = f"""
        WITH idx(i) AS (
          SELECT unnest(generate_series(0, {BLOOM_HASHES - 1}))),
        bits AS (
          SELECT DISTINCT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 ({bit})::INTEGER AS bit
          FROM transcripts, idx i
          WHERE role IS NOT NULL)
    """
    want_bits = {
        (c, ro, t, int(b), int(bt))
        for c, ro, t, b, bt in con.sql(
            filt_sql + "SELECT * FROM bits"
        ).fetchall()
    }
    assert got_bits == want_bits and got_bits

    probe_bit = bloom_bit_sql("k.key", "i.i", BLOOM_BITS)
    member_sql = filt_sql + f""",
        keys(key) AS (SELECT * FROM (VALUES {key_rows})),
        probes AS (
          SELECT DISTINCT k.key, ({probe_bit})::INTEGER AS bit
          FROM keys k, idx i),
        grps AS (SELECT DISTINCT conv_id, role, tool, bucket_ms
                 FROM bits)
        SELECT g.conv_id, g.role, g.tool, g.bucket_ms, p.key,
               bool_and(b.bit IS NOT NULL) AS member
        FROM grps g CROSS JOIN probes p
        LEFT JOIN bits b
          ON b.conv_id = g.conv_id AND b.role = g.role
         AND (b.tool = g.tool OR (b.tool IS NULL AND g.tool IS NULL))
         AND b.bucket_ms = g.bucket_ms
         AND b.bit = p.bit
        GROUP BY 1, 2, 3, 4, 5
    """
    want_member = {
        (c, ro, t, int(b), k): bool(mm)
        for c, ro, t, b, k, mm in con.sql(member_sql).fetchall()
    }
    assert got_member == want_member and got_member


def test_bloom_cascade_raw_touched_once(spark, transcripts):
    """The 1d Bloom tier's plan reads the raw input exactly once (via
    the 1m build); coarser tiers are pure bit unions -- and the 1d
    filter's bit set per day-group equals the union of its hours'."""
    import io
    from contextlib import redirect_stdout

    from prom_tsdb_copyer_spark.operators.sketches import bloom_cascade

    tiers = bloom_cascade(transcripts, SERIES, "role")
    buf = io.StringIO()
    with redirect_stdout(buf):
        tiers["1d"].explain()
    plan = buf.getvalue()
    assert plan.count("LocalTableScan") == 1
    # union law at day grain: every 1d bit appears in some source hour
    day_bits = {
        (r["conv_id"], r["role"], r["tool"], r["bucket_ms"], r["bit"])
        for r in tiers["1d"].collect()
    }
    hour_bits = {
        (r["conv_id"], r["role"], r["tool"],
         (r["bucket_ms"] // 86_400_000) * 86_400_000, r["bit"])
        for r in tiers["1h"].collect()
    }
    assert day_bits == hour_bits and day_bits


def test_fast_hasher_preserves_sketch_laws(spark, transcripts,
                                           transcripts_pdf):
    """hasher='fast' (the xxhash64 production law hashing.py documents
    as the 100TB swap) preserves every sketch guarantee the parity
    path pins: count-min lossless merge + est >= exact, Bloom lossless
    idempotent merge + no false negatives -- with build and probe
    threading the SAME law. Also pins that the two laws really differ
    (different slot relations) and that a bad hasher name raises."""
    import pytest

    from prom_tsdb_copyer_spark.operators.sketches import (
        bloom_contains,
        bloom_reaggregate,
        bloom_tier,
        cms_estimate,
        cms_reaggregate,
        cms_tier,
    )

    keys = sorted(transcripts_pdf["role"].dropna().unique())
    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    sizes = p.groupby(["conv_id", "role", "tool", "bucket_ms"]).size()

    # count-min, fast law
    t1m = cms_tier(transcripts, SERIES, "1m", "role", hasher="fast")
    merged = cms_reaggregate(t1m, SERIES, "1h")
    direct = cms_tier(transcripts, SERIES, "1h", "role", hasher="fast")

    def cells(df):
        return {
            tuple(r[c] for c in [*SERIES, "bucket_ms", "row", "slot"]):
                r["cnt"]
            for r in df.collect()
        }

    fast_cells = cells(direct)
    assert cells(merged) == fast_cells and fast_cells
    assert fast_cells != cells(
        cms_tier(transcripts, SERIES, "1h", "role", hasher="parity")
    )  # genuinely a different law
    est = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["bucket_ms"],
         r["key"]): r["est"]
        for r in cms_estimate(
            merged, [*SERIES, "bucket_ms"], keys, hasher="fast"
        ).collect()
    }
    assert est
    for (cid, role, tool, bms, key), e in est.items():
        want = int(sizes.get((cid, role, tool, bms))) if key == role else 0
        assert e >= want

    # Bloom, fast law
    b1m = bloom_tier(transcripts, SERIES, "1m", "role", hasher="fast")
    bm = bloom_reaggregate(b1m, SERIES, "1h")
    bits_direct = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in bloom_tier(
            transcripts, SERIES, "1h", "role", hasher="fast"
        ).collect()
    }
    assert {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "bit"])
        for r in bm.collect()
    } == bits_direct and bits_direct
    member = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["bucket_ms"],
         r["key"]): r["member"]
        for r in bloom_contains(
            bm, [*SERIES, "bucket_ms"], keys, hasher="fast"
        ).collect()
    }
    assert member
    for (cid, role, tool, bms, key), m in member.items():
        if key == role:
            assert m  # no false negative under the fast law either

    with pytest.raises(ValueError, match="hasher"):
        cms_tier(transcripts, SERIES, "1h", "role", hasher="md5")


def test_kmv_merge_exact_estimates_and_adjacent_jaccard(
    spark, transcripts, transcripts_pdf
):
    """KMV law pins: (1) re-aggregated 1h sketch == built-from-raw,
    row for row (min-k composes exactly); (2) below-k groups estimate
    EXACTLY (n_kept is the true distinct count); (3) at-k estimates
    land within the standard KMV error band; (4) adjacent-bucket
    Jaccard == the exact Jaccard wherever both buckets' key sets fit
    inside the sketches (the fixture regime), and pairs exist only
    where both buckets do."""
    from prom_tsdb_copyer_spark.operators.sketches import (
        kmv_estimate,
        kmv_jaccard_adjacent,
        kmv_reaggregate,
        kmv_tier,
    )

    t1m = kmv_tier(transcripts, SERIES, "1m", "text")
    merged = kmv_reaggregate(t1m, SERIES, "1h")
    direct = kmv_tier(transcripts, SERIES, "1h", "text")

    def rows(df):
        return {
            tuple(r[c] for c in [*SERIES, "bucket_ms", "h"])
            for r in df.collect()
        }

    d = rows(direct)
    assert rows(merged) == d and d

    p = transcripts_pdf.copy()
    p["tool"] = p["tool"].fillna("<null>")
    p["bucket_ms"] = (
        (p["ts"].astype("int64") // 1_000_000) // 3_600_000
    ) * 3_600_000
    exact = p.groupby(
        ["conv_id", "role", "tool", "bucket_ms"]
    )["text"].nunique()
    est = {
        (r["conv_id"], r["role"], r["tool"] or "<null>", r["bucket_ms"]):
            (r["n_kept"], r["n_distinct_est"])
        for r in kmv_estimate(direct, [*SERIES, "bucket_ms"]).collect()
    }
    assert est
    import math

    for key, (n_kept, e) in est.items():
        want = int(exact.loc[key])
        if n_kept < 64:
            assert e == float(want) == float(n_kept), (key, e, want)
        else:
            assert abs(e - want) <= want * (2.5 / math.sqrt(64))

    # adjacent Jaccard at hour grain over conv_id -- within one
    # conversation the per-hour text sets are small (< k), so the
    # sketches are the full sets and J^ is exact
    jac = kmv_jaccard_adjacent(direct, SERIES, "1h")
    got = {
        (r["conv_id"], r["role"], r["tool"] or "<null>",
         r["bucket_ms"]): (r["n_both"], r["n_union_sample"],
                           r["jaccard_est"])
        for r in jac.collect()
    }
    assert got
    sets = {
        k2: set(g["text"])
        for k2, g in p.groupby(["conv_id", "role", "tool", "bucket_ms"])
    }
    checked = 0
    for (c, ro, tl, b), (nb, nu, je) in got.items():
        cur = sets.get((c, ro, tl, b))
        prv = sets.get((c, ro, tl, b - 3_600_000))
        assert cur is not None and prv is not None  # pairs need both
        if len(cur) < 64 and len(prv) < 64:
            inter, union = len(cur & prv), len(cur | prv)
            assert nb == inter and nu == min(64, union)
            assert je == round(inter / union, 6) if union <= 64 else True
            checked += 1
    assert checked >= 15


def test_kmv_vs_duckdb(spark, transcripts, transcripts_pdf):
    """Gate-ready oracle SQL for the KMV family (r9 rotation fuel):
    DuckDB recomputes the 1h min-k sketch (hash60 + row_number) and
    the adjacent-bucket Jaccard counts -- all BIGINT selections, no
    floats accumulated: value-hash promotable."""
    import duckdb

    from prom_tsdb_copyer_spark.functions.hashing import hash60_sql
    from prom_tsdb_copyer_spark.operators.sketches import (
        kmv_jaccard_adjacent,
        kmv_tier,
    )

    t1h = kmv_tier(transcripts, SERIES, "1h", "text")
    got = {
        tuple(r[c] for c in [*SERIES, "bucket_ms", "h"])
        for r in t1h.collect()
    }
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    h = hash60_sql("text")
    sketch_sql = f"""
        WITH hashes AS (
          SELECT DISTINCT conv_id, role, tool,
                 (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
                 ({h}) AS h
          FROM transcripts WHERE text IS NOT NULL),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, role, tool, bucket_ms
            ORDER BY h) AS rk
          FROM hashes)
        , sk AS (SELECT conv_id, role, tool, bucket_ms, h
                 FROM ranked WHERE rk <= 64)
    """
    want = {
        (c, r, t, int(b), int(hh))
        for c, r, t, b, hh in con.sql(
            sketch_sql + "SELECT * FROM sk"
        ).fetchall()
    }
    assert got == want and got

    jac = {
        tuple(r[c] for c in [*SERIES, "bucket_ms"]):
            (r["n_union_sample"], r["n_both"])
        for r in kmv_jaccard_adjacent(t1h, SERIES, "1h").collect()
    }
    jac_sql = sketch_sql + """
        , pairs AS (
          SELECT cur.conv_id, cur.role, cur.tool, cur.bucket_ms,
                 coalesce(cur.h, prv.h) AS h,
                 cur.h IS NOT NULL AS in_cur,
                 prv.h IS NOT NULL AS in_prev
          FROM sk cur
          FULL OUTER JOIN sk prv
            ON prv.conv_id = cur.conv_id AND prv.role = cur.role
           AND (prv.tool = cur.tool
                OR (prv.tool IS NULL AND cur.tool IS NULL))
           AND prv.bucket_ms = cur.bucket_ms - 3600000
           AND prv.h = cur.h
          WHERE cur.h IS NOT NULL),
        prev_only AS (
          SELECT prv.conv_id, prv.role, prv.tool,
                 prv.bucket_ms + 3600000 AS bucket_ms, prv.h,
                 FALSE AS in_cur, TRUE AS in_prev
          FROM sk prv
          WHERE NOT EXISTS (
            SELECT 1 FROM sk cur
            WHERE cur.conv_id = prv.conv_id AND cur.role = prv.role
              AND (cur.tool = prv.tool
                   OR (cur.tool IS NULL AND prv.tool IS NULL))
              AND cur.bucket_ms = prv.bucket_ms + 3600000
              AND cur.h = prv.h)),
        u AS (SELECT * FROM pairs UNION ALL SELECT * FROM prev_only),
        both_sides AS (
          SELECT conv_id, role, tool, bucket_ms
          FROM u GROUP BY 1, 2, 3, 4
          HAVING max(in_cur::int) = 1 AND max(in_prev::int) = 1),
        ranked2 AS (
          SELECT u.*, row_number() OVER (
            PARTITION BY u.conv_id, u.role, u.tool, u.bucket_ms
            ORDER BY u.h) AS rk
          FROM u SEMI JOIN both_sides b
            ON u.conv_id = b.conv_id AND u.role = b.role
           AND (u.tool = b.tool OR (u.tool IS NULL AND b.tool IS NULL))
           AND u.bucket_ms = b.bucket_ms)
        SELECT conv_id, role, tool, bucket_ms,
               count(*) AS n_union_sample,
               sum((in_cur AND in_prev)::int) AS n_both
        FROM ranked2 WHERE rk <= 64
        GROUP BY 1, 2, 3, 4
    """
    want_jac = {
        (c, r, t, int(b)): (int(nu), int(nb))
        for c, r, t, b, nu, nb in con.sql(jac_sql).fetchall()
    }
    assert jac == want_jac and jac
