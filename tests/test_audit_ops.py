"""Tests for the table-level audit operators (ops/audit.py) and the
cross-modal transcript-consistency report (ops/multimodal.py)."""

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# join preflight
# --------------------------------------------------------------------------


def test_join_cardinality_exact_vs_real_join(spark, sf_small_dir):
    """inner_rows equals the actually-executed inner join's count on a
    genuine M:N pair (events.user_id x orders.o_custkey)."""
    from drivel_spark.ops import join_cardinality_report

    ev = spark.read.parquet(f"{sf_small_dir}/events.parquet").select(
        F.col("user_id").alias("k")
    )
    od = spark.read.parquet(f"{sf_small_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k")
    )
    rep = join_cardinality_report(ev, od, "k").collect()[0]
    real = ev.join(od, "k").count()
    assert rep["inner_rows"] == real
    assert rep["n_left_rows"] == ev.filter("k is not null").count()
    assert rep["n_right_rows"] == od.filter("k is not null").count()
    assert rep["amplification"] == pytest.approx(
        real / max(rep["n_left_rows"], rep["n_right_rows"]), abs=1e-6
    )


def test_join_cardinality_flags_and_nulls(spark):
    """Hand-built multiplicities: NULL keys excluded, explodes flag,
    matched-row coverage, max single-key fan-out, top keys ordering."""
    from drivel_spark.ops import join_cardinality_report, join_explosion_keys

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("only_l",)] + [(None,)] * 4,
        "k string",
    )
    right = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 1 + [("only_r",)] * 2 + [(None,)],
        "k string",
    )
    r = join_cardinality_report(left, right, "k", explosion_factor=2.0)
    row = r.collect()[0]
    assert row["n_left_rows"] == 6 and row["n_right_rows"] == 8  # NULLs out
    assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
    assert row["n_common_keys"] == 2
    assert row["inner_rows"] == 3 * 5 + 2 * 1
    assert row["max_key_out"] == 15
    assert row["left_matched_rows"] == 5 and row["right_matched_rows"] == 6
    assert row["explodes"] is True  # 17 > 2.0 * 8

    top = join_explosion_keys(left, right, "k", top_k=1).collect()
    assert len(top) == 1 and top[0]["k"] == "a" and top[0]["n_out"] == 15


def test_join_cardinality_composite_key(spark):
    from drivel_spark.ops import join_cardinality_report

    left = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2)], "k string, j int"
    )
    right = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 1)], "k string, j int"
    )
    row = join_cardinality_report(left, right, ["k", "j"]).collect()[0]
    assert row["inner_rows"] == 2 * 1 + 1 * 2
    assert row["n_common_keys"] == 2
    assert row["explodes"] is False


# --------------------------------------------------------------------------
# snapshot churn
# --------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from drivel_spark.ops import snapshot_diff, snapshot_diff_summary

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, None, 30.0),  # NULL field survives hashing distinctly
            (4, "d", 40.0),
        ],
        "id int, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "B", 20.0),      # changed
            (3, "c", 30.0),      # changed: NULL -> 'c' must be detected
            (5, "e", 50.0),      # added  (4 removed)
        ],
        "id int, s string, v double",
    )
    d = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()}
    assert d == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }
    s = snapshot_diff_summary(old, new, "id").collect()[0]
    assert (s["n_added"], s["n_removed"], s["n_changed"], s["n_unchanged"]) == (
        1, 1, 2, 1,
    )
    assert s["churn_ratio"] == pytest.approx(4 / 4, abs=1e-6)


def test_snapshot_diff_duplicate_keys_order_insensitive(spark):
    """Multiset semantics: reordered duplicate rows compare equal;
    a count change or a content change under the same key is
    'changed'."""
    from drivel_spark.ops import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "p"), (3, "q"), (3, "q")],
        "id int, s string",
    )
    new = spark.createDataFrame(
        [(1, "y"), (1, "x"), (2, "p"), (2, "p"), (3, "q")],
        "id int, s string",
    )
    d = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()}
    assert d[1] == "unchanged"   # same multiset, different order
    assert d[2] == "changed"     # same content hashes but count 1 -> 2
    assert d[3] == "changed"     # count 2 -> 1


def test_snapshot_diff_compare_cols_and_errors(spark):
    from drivel_spark.ops import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1)], "id int, s string, extra int")
    new = spark.createDataFrame([(1, "a", 9)], "id int, s string, extra int")
    # restricted compare ignores the changed column
    d = snapshot_diff(old, new, "id", compare_cols=["s"]).collect()
    assert d[0]["status"] == "unchanged"
    with pytest.raises(ValueError):
        snapshot_diff(old.select("id"), new.select("id"), "id")


# --------------------------------------------------------------------------
# file layout
# --------------------------------------------------------------------------


def test_file_layout_report_and_summary(spark, tmp_path):
    from drivel_spark.ops import file_layout_report, file_layout_summary

    out = str(tmp_path / "t")
    df = spark.range(10_000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    df.repartition(7).write.parquet(out)

    rep = file_layout_report(spark, out)
    rows = rep.collect()
    assert len(rows) == 7
    assert sum(r["n_rows"] for r in rows) == 10_000
    assert all(r["bytes"] and r["bytes"] > 0 for r in rows)

    s = file_layout_summary(
        spark, out, target_file_mb=512, small_file_mb=32
    ).collect()[0]
    assert s["n_files"] == 7 and s["n_rows"] == 10_000
    assert s["total_bytes"] == sum(r["bytes"] for r in rows)
    assert s["n_small_files"] == 7  # tiny local files
    assert s["small_file_ratio"] == pytest.approx(1.0)
    assert s["recommended_files"] == 1  # everything fits one 512MB file


# --------------------------------------------------------------------------
# cross-modal transcript consistency
# --------------------------------------------------------------------------


def test_transcript_consistency_conflicts(spark):
    """Two clips with byte-identical audio but different transcripts
    conflict; same transcript up to normalization does not; NULL vs
    labeled on the same audio conflicts."""
    from drivel_spark.ops import transcript_consistency_report
    from drivel_spark.produce.audio import synth_pcm, wav_encode

    def wav(clip_idx):
        # synth_pcm's tone frequency is a function of clip_idx: same
        # idx => same fingerprint bucket, different idx => different
        return wav_encode(synth_pcm(clip_idx, 8000, 1000, seed=1), 8000)

    rows = [
        # fingerprint group A (idx 0): consistent up to normalization
        ("a1", wav(0), "Hello  World"),
        ("a2", wav(0), "hello world"),
        # group B (idx 1): genuine conflict
        ("b1", wav(1), "foo"),
        ("b2", wav(1), "bar"),
        # group C (idx 2): labeled vs NULL -> conflict
        ("c1", wav(2), "baz"),
        ("c2", wav(2), None),
        # undecodable payload: excluded entirely
        ("x1", b"notawav", "junk"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, transcript string"
    )
    rep = {
        r["example_clip_id"]: r
        for r in transcript_consistency_report(df).collect()
    }
    assert set(rep) == {"a1", "b1", "c1"}
    assert rep["a1"]["n_clips"] == 2 and rep["a1"]["n_transcripts"] == 1
    assert rep["a1"]["conflict"] is False
    assert rep["b1"]["n_transcripts"] == 2 and rep["b1"]["conflict"] is True
    assert rep["c1"]["n_transcripts"] == 2 and rep["c1"]["conflict"] is True


# --------------------------------------------------------------------------
# functional dependencies / candidate keys
# --------------------------------------------------------------------------


def test_fd_report_holds_and_violates(spark):
    """Hand-built FDs: a holding dependency, a violated one (incl. a
    mixed NULL/non-NULL rhs group counting as a violation), NULL-lhs
    rows excluded, composite lhs."""
    from drivel_spark.ops import fd_report

    df = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("a", 1, "x"),
            ("b", 2, "x"),
            ("b", 2, "y"),      # b -> {x, y}: violates c1->c3
            ("c", 3, None),
            ("c", 3, "z"),      # mixed NULL/real rhs: violates
            (None, 9, "q"),     # NULL lhs: excluded everywhere
        ],
        "c1 string, c2 int, c3 string",
    )
    rep = {r["lhs"] + "->" + r["rhs"]: r for r in fd_report(
        df, [("c1", "c2"), ("c1", "c3"), (["c1", "c2"], "c3")]
    ).collect()}
    holds = rep["c1->c2"]
    assert holds["holds"] is True and holds["n_violating_groups"] == 0
    assert holds["n_groups"] == 3
    viol = rep["c1->c3"]
    assert viol["holds"] is False
    assert viol["n_violating_groups"] == 2       # b and c
    assert viol["n_violating_rows"] == 4
    assert viol["violation_ratio"] == pytest.approx(4 / 6, abs=1e-6)
    comp = rep["c1+c2->c3"]
    assert comp["n_groups"] == 3 and comp["holds"] is False


def test_fd_report_real_key_dependency(spark, sf_small_dir):
    """o_orderkey -> o_custkey holds (orderkey is a key); o_custkey ->
    o_orderstatus does not (customers place orders in many states)."""
    from drivel_spark.ops import fd_report

    o = spark.read.parquet(f"{sf_small_dir}/orders.parquet")
    rep = {r["lhs"]: r for r in fd_report(
        o, [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")]
    ).collect()}
    assert rep["o_orderkey"]["holds"] is True
    assert rep["o_custkey"]["holds"] is False


def test_candidate_key_report_exact_confirm(spark):
    """confirm_threshold=0.0 exact-confirms every candidate; dup keys
    and dup rows counted; NULL-bearing rows excluded per candidate;
    composite candidate becomes a key when the single column is not."""
    from drivel_spark.ops import candidate_key_report

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 20),
            (2, "b", 30),       # id=2 duplicated
            (None, "c", 40),    # NULL id: out of id's accounting
        ],
        "id int, grp string, v int",
    )
    rep = {r["key"]: r for r in candidate_key_report(
        df, ["id", "grp", ["id", "grp"], "v"], confirm_threshold=0.0
    ).collect()}
    rid = rep["id"]
    assert rid["n_rows"] == 3 and rid["n_distinct"] == 2
    assert rid["n_dup_keys"] == 1 and rid["n_dup_rows"] == 2
    assert rid["is_key"] is False
    assert rep["grp"]["is_key"] is False          # 'a' twice
    comp = rep["id+grp"]
    assert comp["n_rows"] == 3 and comp["is_key"] is True
    assert rep["v"]["is_key"] is True


def test_candidate_key_report_screen_skips_hopeless(spark):
    """With a high confirm threshold the low-cardinality candidate is
    screened out by the sketch pass: exact columns NULL, is_key False,
    and no exact shuffle was paid for it."""
    from drivel_spark.ops import candidate_key_report

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("lowcard")
    )
    rep = {r["key"]: r for r in candidate_key_report(
        df, ["id", "lowcard"], confirm_threshold=0.9
    ).collect()}
    assert rep["id"]["is_key"] is True and rep["id"]["n_distinct"] == 1000
    low = rep["lowcard"]
    assert low["n_distinct"] is None and low["n_dup_keys"] is None
    assert low["is_key"] is False
    assert low["approx_distinct"] <= 10


# --------------------------------------------------------------------------
# file clustering (zone-map effectiveness)
# --------------------------------------------------------------------------


def test_file_clustering_sorted_vs_hashed(spark, tmp_path):
    """Range-partitioned+sorted layout has non-overlapping zones
    (max_point_depth 1, 0 overlapping pairs); hash layout's zones all
    overlap (depth == n_files)."""
    from drivel_spark.ops import file_clustering_report, file_clustering_summary

    df = spark.range(10_000).select(F.col("id").cast("long").alias("k"))
    sorted_dir = str(tmp_path / "sorted")
    hashed_dir = str(tmp_path / "hashed")
    df.repartitionByRange(8, "k").sortWithinPartitions("k") \
        .write.mode("overwrite").parquet(sorted_dir)
    df.repartition(8, "k").write.mode("overwrite").parquet(hashed_dir)

    s = file_clustering_summary(spark, sorted_dir, "k").collect()[0]
    assert s["n_files"] == 8 and s["n_rows"] == 10_000
    assert s["max_point_depth"] == 1 and s["overlapping_pairs"] == 0
    assert s["perfectly_clustered"] is True

    h = file_clustering_summary(spark, hashed_dir, "k").collect()[0]
    assert h["n_files"] == 8
    assert h["max_point_depth"] == 8
    assert h["overlapping_pairs"] == 8 * 7 // 2
    assert h["perfectly_clustered"] is False

    rep = file_clustering_report(spark, sorted_dir, "k").collect()
    zones = sorted((r["min_v"], r["max_v"]) for r in rep)
    for (lo1, hi1), (lo2, _) in zip(zones, zones[1:]):
        assert hi1 < lo2  # truly disjoint


def test_file_clustering_touching_zones_overlap(spark, tmp_path):
    """Inclusive ranges: two files sharing one boundary value DO
    overlap (depth 2 at the shared value) — the pruning-correct
    convention, since a point query for that value must read both."""
    from drivel_spark.ops import file_clustering_summary

    a = spark.createDataFrame([(0,), (5,)], "k int").coalesce(1)
    b = spark.createDataFrame([(5,), (9,)], "k int").coalesce(1)
    d2 = str(tmp_path / "p")
    a.write.mode("overwrite").parquet(d2)
    b.write.mode("append").parquet(d2)
    s = file_clustering_summary(spark, d2, "k").collect()[0]
    assert s["n_files"] == 2
    assert s["max_point_depth"] == 2 and s["overlapping_pairs"] == 1


# --------------------------------------------------------------------------
# audio feature drift
# --------------------------------------------------------------------------


def _np_w1(a, b):
    """Exact empirical W1 = integral |F_a - F_b| dv, numpy reference."""
    import numpy as np

    a, b = np.sort(np.asarray(a, float)), np.sort(np.asarray(b, float))
    vs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, vs, side="right") / len(a)
    fb = np.searchsorted(b, vs, side="right") / len(b)
    return float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(vs)))


def test_audio_feature_drift_detects_duration_shift(spark):
    """default vs drifted fixture: decoded duration_ms drifts (the
    variant scales dur x1.5), W1 matches a numpy exact reference, and
    identical batches report exactly zero drift."""
    from drivel_spark.fixtures import ClipFixtureSpec, build_clips
    from drivel_spark.ops import audio_feature_drift, extract_audio_features

    n = 60
    a = build_clips(spark, n, 4, ClipFixtureSpec(with_audio=True))
    b = build_clips(
        spark, n, 4, ClipFixtureSpec(with_audio=True, variant="drifted")
    )
    rep = {
        r["feature"]: r
        for r in audio_feature_drift(
            a, b, features=("duration_ms", "rms")
        ).collect()
    }
    dur = rep["duration_ms"]
    assert dur["n_a"] == n and dur["n_b"] == n
    assert dur["w1"] > 50.0  # the x1.5 shift is hundreds of ms of W1
    assert dur["mean_b"] > dur["mean_a"]

    # numpy cross-check of the exact W1 on the engine's own features
    fa = extract_audio_features(a).select("duration_ms").toPandas()
    fb = extract_audio_features(b).select("duration_ms").toPandas()
    expect = _np_w1(fa["duration_ms"], fb["duration_ms"])
    assert dur["w1"] == pytest.approx(expect, rel=1e-9)

    same = {
        r["feature"]: r
        for r in audio_feature_drift(a, a, features=("duration_ms",)).collect()
    }
    assert same["duration_ms"]["w1"] == pytest.approx(0.0, abs=1e-12)


def test_snapshot_diff_randomized_vs_bruteforce(spark):
    """Randomized multiset property test: snapshot_diff's hash-based
    statuses equal a brute-force python dict-of-multisets compare, over
    tables with duplicate keys, NULL fields, and reordered rows."""
    import numpy as np

    from collections import Counter

    from drivel_spark.ops import snapshot_diff

    rng = np.random.default_rng(23)
    for trial in range(5):
        def draw():
            n = int(rng.integers(20, 60))
            keys = rng.integers(0, 25, n)          # heavy duplication
            vals = rng.integers(0, 4, n)
            strs = rng.integers(0, 5, n)
            return [
                (
                    int(k),
                    None if s == 0 else f"s{s}",
                    float(v),
                )
                for k, s, v in zip(keys, strs, vals)
            ]

        old_rows, new_rows = draw(), draw()
        old = spark.createDataFrame(old_rows, "id int, s string, v double")
        new = spark.createDataFrame(new_rows, "id int, s string, v double")

        def multisets(rows):
            out = {}
            for k, s, v in rows:
                out.setdefault(k, Counter())[(s, v)] += 1
            return out

        mo, mn = multisets(old_rows), multisets(new_rows)
        expect = {}
        for k in set(mo) | set(mn):
            if k not in mo:
                expect[k] = "added"
            elif k not in mn:
                expect[k] = "removed"
            elif mo[k] == mn[k]:
                expect[k] = "unchanged"
            else:
                expect[k] = "changed"

        got = {
            r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()
        }
        assert got == expect, f"trial {trial}"


def test_aggregate_reconcile(spark):
    """All four statuses: ok within tolerance, mismatch beyond, parent
    with no child rows, child key with no parent; carry columns pass
    through; NULL child keys never match (equi-join semantics)."""
    from drivel_spark.ops import aggregate_reconcile, reconcile_summary

    parent = spark.createDataFrame(
        [(1, "A", 30.0), (2, "B", 10.0), (3, "A", 5.0)],
        "k int, seg string, total double",
    )
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.005), (2, 25.0), (4, 7.0), (None, 99.0)],
        "k int, amount double",
    )
    import pyspark.sql.functions as F

    rep = aggregate_reconcile(
        parent, child, "k", "total", F.sum("amount"),
        tol_abs=0.01, carry_cols=["seg"],
    ).toPandas().set_index("k")
    assert rep.loc[1]["recon_status"] == "ok"  # |30 - 30.005| <= 0.01
    assert rep.loc[2]["recon_status"] == "mismatch"
    assert rep.loc[3]["recon_status"] == "missing_child"
    assert rep.loc[4]["recon_status"] == "orphan_child"
    assert rep.loc[1]["seg"] == "A" and rep.loc[3]["seg"] == "A"
    import math

    assert math.isnan(rep.loc[3]["abs_diff"]) or rep.loc[3]["abs_diff"] is None
    # the NULL child key contributes no orphan row
    assert len(rep) == 4

    summ = reconcile_summary(
        aggregate_reconcile(parent, child, "k", "total", F.sum("amount"),
                            tol_abs=0.01)
    ).toPandas().set_index("recon_status")
    assert summ.loc["ok"]["n_keys"] == 1
    assert summ.loc["mismatch"]["n_keys"] == 1
    assert summ.loc["mismatch"]["n_diff_1_to_1e3"] == 1
    assert summ.loc["missing_child"]["n_keys"] == 1
    assert summ.loc["orphan_child"]["n_keys"] == 1


def test_cross_modal_consistency(spark):
    """Byte-identical audio with two transcripts flags both rows
    conflicting; identical audio with ONE transcript is a benign dup;
    a transcript shared across different payloads flags recycled (but
    not conflicting); NULL transcripts count as missing, never as a
    distinct label; the fixture's mislabel hook yields exactly the
    planted pair count end-to-end."""
    from drivel_spark.ops import cross_modal_consistency, cross_modal_summary

    rows = [
        ("a1", b"\x01\x02", "hello"),
        ("a2", b"\x01\x02", "goodbye"),   # conflict with a1
        ("b1", b"\x03\x04", "same"),
        ("b2", b"\x03\x04", "same"),      # benign exact dup
        ("c1", b"\x05\x06", "common"),
        ("c2", b"\x07\x08", "common"),    # recycled transcript
        ("d1", b"\x09\x0a", None),        # missing transcript
        ("d2", b"\x09\x0a", "labeled"),   # dup audio, one label + one NULL
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, transcript string")
    rep = cross_modal_consistency(df).toPandas().set_index("clip_id")
    assert rep.loc["a1"]["conflicting_transcript"]
    assert rep.loc["a2"]["conflicting_transcript"]
    assert not rep.loc["b1"]["conflicting_transcript"]
    assert rep.loc["b1"]["n_same_audio"] == 2
    assert not rep.loc["c1"]["conflicting_transcript"]
    assert rep.loc["c1"]["recycled_transcript"]
    assert rep.loc["c2"]["recycled_transcript"]
    # one label + one NULL is not a conflict
    assert not rep.loc["d2"]["conflicting_transcript"]
    assert rep.loc["d1"]["text_key"] is None or rep.loc["d1"]["text_key"] != rep.loc["d1"]["text_key"] or rep.loc["d1"].isnull()["text_key"]

    summ = cross_modal_summary(cross_modal_consistency(df)).toPandas().iloc[0]
    assert summ["n_clips"] == 8
    assert summ["n_audio_groups"] == 5
    assert summ["n_dup_audio_groups"] == 3
    assert summ["n_conflicting_groups"] == 1
    assert summ["n_conflicting_clips"] == 2
    assert summ["n_recycled_clips"] == 2
    assert summ["n_missing_transcript"] == 1

    # fixture integration: planted mislabel pairs surface exactly
    from drivel_spark.fixtures import ClipFixtureSpec, build_clips

    clips = build_clips(spark, 40, 4, ClipFixtureSpec(with_audio=True,
                                                      mislabel_every=8))
    s2 = cross_modal_summary(cross_modal_consistency(clips)).toPandas().iloc[0]
    # pairs at idx 5,13,21,29,37 — but idx 13's transcript is NULL
    # (inject rule idx%200==13), so (12,13) is a dup without a second
    # label: 4 conflicting groups of 2 clips + 5 dup-audio groups
    assert s2["n_dup_audio_groups"] == 5
    assert s2["n_conflicting_groups"] == 4
    assert s2["n_conflicting_clips"] == 8


# --------------------------------------------------------------------------
# violation slice attribution
# --------------------------------------------------------------------------


def _slice_replay(rows, dims, flag, max_order):
    """Local itertools replay of violation_slice_report: every dim
    combination of order 1..max_order, counts over the raw rows."""
    import itertools

    out = {}
    t_rows = len(rows)
    t_viol = sum(1 for r in rows if flag(r))
    base = t_viol / t_rows
    for order in range(1, max_order + 1):
        for combo in itertools.combinations(range(len(dims)), order):
            groups = {}
            for r in rows:
                key = tuple(r[dims[i]] if i in combo else "__ANY__" for i in range(len(dims)))
                n, v = groups.get(key, (0, 0))
                groups[key] = (n + 1, v + (1 if flag(r) else 0))
            for key, (n, v) in groups.items():
                out[key] = {
                    "n_rows": n,
                    "n_viol": v,
                    "viol_rate": v / n,
                    "base_rate": base,
                    "lift": (v / n) / base if base > 0 else None,
                    "excess": v - n * base,
                }
    return out


def test_violation_slices_planted_and_null_dim(spark):
    """A planted bad slice tops the excess ranking; a genuine NULL dim
    value stays distinct from the aggregated-out 'any' slice via the
    g_ flags; counts/rates match a local replay exactly."""
    from drivel_spark.ops import top_violation_slices, violation_slice_report

    rows = (
        # healthy bulk: 60 rows, 10% violations across (wav, s1)
        [{"codec": "wav", "shard": "s1", "bad": i % 10 == 0} for i in range(60)]
        # planted: amr x s2 violates 90%
        + [{"codec": "amr", "shard": "s2", "bad": i % 10 != 0} for i in range(30)]
        # NULL codec rows — a real NULL value, not "any"
        + [{"codec": None, "shard": "s1", "bad": True} for _ in range(5)]
        + [{"codec": None, "shard": "s1", "bad": False} for _ in range(5)]
    )
    df = spark.createDataFrame(
        [(r["codec"], r["shard"], r["bad"]) for r in rows],
        "codec string, shard string, bad boolean",
    )
    rep = violation_slice_report(
        df, F.col("bad"), ["codec", "shard"], max_order=2
    )
    got = {
        tuple(
            ("__ANY__" if r[f"g_{d}"] == 1 else r[d]) for d in ("codec", "shard")
        ): r
        for r in rep.collect()
    }
    want = _slice_replay(rows, ["codec", "shard"], lambda r: r["bad"], 2)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g["n_rows"] == w["n_rows"], key
        assert g["n_viol"] == w["n_viol"], key
        assert g["viol_rate"] == pytest.approx(w["viol_rate"], abs=1e-12)
        assert g["base_rate"] == pytest.approx(w["base_rate"], abs=1e-12)
        assert g["excess"] == pytest.approx(w["excess"], abs=1e-9)
    # the NULL-codec slice is its own row, distinct from (any, s1)
    assert got[(None, "s1")]["n_viol"] == 5 and got[(None, "s1")]["n_rows"] == 10
    assert got[("__ANY__", "s1")]["n_rows"] == 70
    # planted slice tops the excess ranking among order-2 slices
    top = top_violation_slices(rep.where("slice_order = 2"), 1).collect()[0]
    assert top["codec"] == "amr" and top["shard"] == "s2"
    assert top["n_viol"] == 27


def test_violation_slices_order_and_support_filters(spark):
    """max_order=1 drops pair slices; min_rows prunes thin slices; an
    all-false flag yields zero excess everywhere and NULL-safe lift."""
    from drivel_spark.ops import violation_slice_report

    df = spark.createDataFrame(
        [("a", "x", False)] * 4 + [("b", "y", False)],
        "c1 string, c2 string, bad boolean",
    )
    rep = violation_slice_report(df, "bad", ["c1", "c2"], max_order=1)
    rows = rep.collect()
    assert all(r["slice_order"] == 1 for r in rows)
    assert len(rows) == 4  # c1 in {a,b}, c2 in {x,y}
    assert all(r["n_viol"] == 0 and r["excess"] == 0.0 for r in rows)
    assert all(r["lift"] is None for r in rows)  # base_rate 0
    thick = violation_slice_report(
        df, "bad", ["c1", "c2"], max_order=1, min_rows=2
    ).collect()
    assert {(r["c1"], r["c2"]) for r in thick} == {("a", None), (None, "x")}


def test_violation_slices_from_tables_identical(spark):
    """violation_slice_report_from_tables(full, full.where(flag)) is
    row-for-row identical to violation_slice_report(full, flag) —
    including slices with ZERO violations (left join + coalesce) and a
    NULL dim value present on both the full and violation side."""
    from drivel_spark.ops import (
        violation_slice_report,
        violation_slice_report_from_tables,
    )

    df = spark.createDataFrame(
        [("wav", "s1", i % 10 == 0) for i in range(40)]
        + [("amr", "s2", i % 10 != 0) for i in range(20)]
        + [(None, "s2", True) for _ in range(4)]
        + [("ogg", "s3", False) for _ in range(6)],  # zero-violation slice
        "codec string, shard string, bad boolean",
    )
    direct = violation_slice_report(
        df, "bad", ["codec", "shard"], max_order=2
    )
    split = violation_slice_report_from_tables(
        df, df.where("bad"), ["codec", "shard"], max_order=2
    )
    key = lambda r: (r["g_codec"], r["g_shard"], r["codec"], r["shard"])  # noqa: E731
    a = {key(r): r for r in direct.collect()}
    b = {key(r): r for r in split.collect()}
    assert set(a) == set(b)
    for k in a:
        for c in ("slice_order", "n_rows", "n_viol"):
            assert a[k][c] == b[k][c], (k, c)
        for c in ("viol_rate", "base_rate", "excess"):
            assert a[k][c] == pytest.approx(b[k][c], abs=1e-12), (k, c)
    # the zero-violation slice exists and reports negative excess
    assert b[(0, 0, "ogg", "s3")]["n_viol"] == 0
    assert b[(0, 0, "ogg", "s3")]["excess"] < 0


def test_constraint_slice_report(spark):
    """Per-constraint attribution: each constraint scored against its
    OWN base rate; a multi-failure row contributes to every failed
    constraint; per-constraint report rows equal the single-constraint
    violation_slice_report run on that constraint's rows alone."""
    from drivel_spark.ops import (
        constraint_slice_report,
        violation_slice_report,
    )

    # c_rare fails only in (amr, s2); c_common fails 1-in-5 everywhere
    rows = []
    for i in range(50):
        codec = "amr" if i < 10 else "wav"
        shard = "s2" if i < 10 else "s1"
        failed = []
        if codec == "amr" and i % 2 == 0:
            failed.append("c_rare")
        if i % 5 == 0:
            failed.append("c_common")
        rows.append((codec, shard, failed))
    df = spark.createDataFrame(
        rows, "codec string, shard string, failed array<string>"
    )
    viol = df.where(F.size("failed") > 0)
    rep = constraint_slice_report(
        df, viol, ["codec", "shard"], max_order=2
    ).collect()
    key = lambda r: (r["constraint"], r["g_codec"], r["g_shard"], r["codec"], r["shard"])  # noqa: E731
    got = {key(r): r for r in rep}

    for cname in ("c_rare", "c_common"):
        single = violation_slice_report(
            df, F.array_contains("failed", cname), ["codec", "shard"], max_order=2
        ).collect()
        for r in single:
            if r["n_viol"] == 0:
                # per-constraint report keeps only slices where the
                # constraint actually fired (inner join by design)
                assert (cname, r["g_codec"], r["g_shard"], r["codec"], r["shard"]) not in got
                continue
            g = got[(cname, r["g_codec"], r["g_shard"], r["codec"], r["shard"])]
            assert g["n_rows"] == r["n_rows"]
            assert g["n_viol"] == r["n_viol"]
            assert g["base_rate"] == pytest.approx(r["base_rate"], abs=1e-12)
            assert g["excess"] == pytest.approx(r["excess"], abs=1e-9)
    # the rare constraint's hot slice shows a high per-constraint lift
    hot = got[("c_rare", 0, 0, "amr", "s2")]
    assert hot["n_viol"] == 5 and hot["n_rows"] == 10
    assert hot["lift"] == pytest.approx((5 / 10) / (5 / 50), abs=1e-9)
