"""Sketch accuracy + merge-invariance tests."""

import numpy as np
import pandas as pd
import pytest

from drivel_spark.sketches import KLL, BottomK, HyperLogLog, SpaceSaving, hash64


def test_hash64_stable_and_salted():
    a = hash64(["x", "y", "z"])
    b = hash64(["x", "y", "z"])
    assert np.array_equal(a, b)
    c = hash64(["x", "y", "z"], salt=1)
    assert not np.array_equal(a, c)


def test_hll_accuracy():
    rng = np.random.default_rng(0)
    for true_n in (100, 10_000, 200_000):
        vals = rng.integers(0, 2**62, size=true_n).astype(str)
        vals = np.unique(vals)
        h = HyperLogLog(p=12)
        h.update(vals)
        est = h.estimate()
        assert abs(est - len(vals)) / len(vals) < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(1)
    a_vals = rng.integers(0, 10**9, size=50_000).astype(str)
    b_vals = rng.integers(5 * 10**8, 15 * 10**8, size=50_000).astype(str)
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.update(a_vals)
    b.update(b_vals)
    u.update(np.concatenate([a_vals, b_vals]))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)
    assert merged.estimate() == u.estimate()


def test_hll_serde():
    h = HyperLogLog()
    h.update(["a", "b", "c"])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_kll_quantile_accuracy():
    rng = np.random.default_rng(2)
    data = rng.lognormal(3, 1, size=100_000)
    sk = KLL(k=200)
    for chunk in np.array_split(data, 50):
        sk.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        true = np.quantile(data, q)
        est = sk.quantile(q)
        # rank error ≤ ~1.5% of n for k=200
        rank_true = np.searchsorted(np.sort(data), est) / data.size
        assert abs(rank_true - q) < 0.02, (q, true, est)


def test_kll_merge_accuracy():
    rng = np.random.default_rng(3)
    parts = [rng.normal(100, 15, size=20_000) for _ in range(8)]
    sketches = []
    for p in parts:
        sk = KLL(k=200)
        sk.update(p)
        sketches.append(sk)
    merged = sketches[0]
    for sk in sketches[1:]:
        merged = merged.merge(sk)
    alldata = np.concatenate(parts)
    assert merged.n == alldata.size
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        rank = np.searchsorted(np.sort(alldata), est) / alldata.size
        assert abs(rank - q) < 0.025


def test_kll_cdf_monotone():
    sk = KLL()
    sk.update(np.arange(1000.0))
    pts = np.array([0.0, 100.0, 500.0, 999.0])
    cdf = sk.cdf(pts)
    assert np.all(np.diff(cdf) >= 0)
    assert cdf[0] >= 0 and cdf[-1] <= 1.0


def test_kll_serde():
    sk = KLL()
    sk.update(np.arange(5000.0))
    sk2 = KLL.from_bytes(sk.to_bytes())
    assert sk2.n == sk.n
    assert sk2.quantile(0.5) == sk.quantile(0.5)


def test_spacesaving_exact_when_under_capacity():
    ss = SpaceSaving(capacity=10)
    s = pd.Series(["a"] * 5 + ["b"] * 3 + ["c"] * 2)
    ss.update(s)
    assert ss.counts == {"a": 5, "b": 3, "c": 2}
    assert ss.is_exact


def test_spacesaving_heavy_hitters_survive():
    rng = np.random.default_rng(4)
    # zipf-ish: key0 dominates
    keys = np.concatenate(
        [np.full(50_000, "hot"), rng.integers(0, 5000, size=50_000).astype(str)]
    )
    rng.shuffle(keys)
    ss = SpaceSaving(capacity=64)
    for chunk in np.array_split(keys, 20):
        ss.update(pd.Series(chunk))
    top = ss.top(1)
    assert top[0][0] == "hot"
    assert top[0][1] >= 50_000  # overestimates only


def test_spacesaving_merge():
    a, b = SpaceSaving(8), SpaceSaving(8)
    a.update(pd.Series(["x"] * 10 + ["y"] * 5))
    b.update(pd.Series(["x"] * 7 + ["z"] * 3))
    m = a.merge(b)
    assert m.counts["x"] == 17


def test_bottomk_deterministic_and_merge_invariant():
    vals = pd.Series([f"v{i}" for i in range(1000)])
    whole = BottomK(16)
    whole.update(vals)
    a, b = BottomK(16), BottomK(16)
    a.update(vals[:300])
    b.update(vals[300:])
    ab = a.merge(b)
    ba = b.merge(a)
    assert sorted(ab.sample()) == sorted(whole.sample())
    assert sorted(ba.sample()) == sorted(whole.sample())


def test_tdigest_accuracy_and_merge():
    """t-digest: tail-accurate quantiles on a skewed distribution, and
    a k-way merge agrees with the single-digest answer within the
    rank-error bound (north_star: KLL/t-digest quantile sketches)."""
    import numpy as np

    from drivel_spark.sketches import TDigest

    rng = np.random.default_rng(7)
    data = np.exp(rng.normal(size=200_000))  # log-normal, heavy tail
    ranks = np.sort(data)

    def true_q(q):
        return float(ranks[min(int(q * len(ranks)), len(ranks) - 1)])

    td = TDigest(delta=200)
    td.update(data)
    for q, tol in ((0.5, 0.01), (0.99, 0.005), (0.999, 0.002)):
        est = td.quantile(q)
        # rank error: where does the estimate fall in the sorted data?
        rank = np.searchsorted(ranks, est) / len(ranks)
        assert abs(rank - q) <= tol, (q, rank)

    # mergeability: 16 partition digests merged == one digest, within bound
    parts = np.array_split(data, 16)
    merged = TDigest(delta=200)
    for part in parts:
        d = TDigest(delta=200)
        d.update(part)
        merged = merged.merge(d)
    assert merged.n == len(data)
    for q in (0.5, 0.99):
        rank = np.searchsorted(ranks, merged.quantile(q)) / len(ranks)
        assert abs(rank - q) <= 0.02

    # determinism: same input, same order -> identical bytes
    a, b = TDigest(200), TDigest(200)
    a.update(data[:5000]); b.update(data[:5000])
    assert a.to_bytes() == b.to_bytes()

    # cdf is monotone and hits the ends
    pts = np.quantile(data, [0.1, 0.5, 0.9])
    cdf = merged.cdf(pts)
    assert (np.diff(cdf) >= 0).all() and 0 <= cdf[0] <= 0.2 and 0.8 <= cdf[-1] <= 1


def test_profile_with_tdigest(spark, sf_small_dir):
    """ProfilerOptions(tdigest_delta>0) carries a t-digest through the
    distributed scan + tree combine; its median agrees with KLL's."""
    from drivel_spark.profiling import ProfilerOptions, profile

    li = spark.read.parquet(f"{sf_small_dir}/lineitem.parquet")
    prof = profile(
        li, columns=["l_extendedprice"], opts=ProfilerOptions(tdigest_delta=200)
    )
    acc = prof.column("l_extendedprice")
    assert acc.tdigest is not None and acc.tdigest.n == acc.kll.n
    kll_med, td_med = acc.kll.quantile(0.5), acc.tdigest.quantile(0.5)
    assert abs(td_med - kll_med) / kll_med < 0.05
    assert "tdigest_quantiles" in acc.summary()
