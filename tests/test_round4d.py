"""Round-4 fourth-session operators: preference pairs, mixture resample,
quantile band filter, ordered EWMA, grouped-minhash source similarity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _pairs_df(ds):
    return ds.to_pandas().sort_values("prompt_key").reset_index(drop=True)


class TestPreferencePairs:
    def _run(self, rows, **kw):
        from vaero_ray.stages.preference import preference_pairs

        ds = rd.from_pandas(pd.DataFrame(rows).astype("int64"))
        return _pairs_df(
            preference_pairs(ds, "prompt_key", "score", "resp_id", num_buckets=4, **kw)
        )

    def test_basic_pair(self, ray_session):
        out = self._run(
            {"prompt_key": [1, 1, 1], "resp_id": [10, 11, 12], "score": [5, 9, 7]}
        )
        assert len(out) == 1
        r = out.iloc[0]
        assert (r.chosen_id, r.chosen_score) == (11, 9)
        assert (r.rejected_id, r.rejected_score) == (10, 5)
        assert r.margin == 4 and r.n_candidates == 3

    def test_all_equal_scores_distinct_rows(self, ray_session):
        # all-equal scores: chosen = min id, rejected = max id — never the
        # same row for n >= 2 (the opposed tie-break guarantee)
        out = self._run({"prompt_key": [7, 7], "resp_id": [3, 4], "score": [5, 5]})
        r = out.iloc[0]
        assert r.chosen_id == 3 and r.rejected_id == 4 and r.margin == 0

    def test_singleton_groups_dropped(self, ray_session):
        out = self._run({"prompt_key": [1, 2, 2], "resp_id": [1, 2, 3], "score": [1, 2, 3]})
        assert list(out.prompt_key) == [2]

    def test_shard_invariance(self, ray_session):
        from vaero_ray.stages.preference import preference_pairs

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "prompt_key": rng.integers(0, 20, 500),
                "resp_id": np.arange(500),
                "score": rng.integers(0, 50, 500),
            }
        ).astype("int64")
        outs = []
        for nblocks in (1, 7):
            ds = rd.from_pandas(df).repartition(nblocks)
            outs.append(_pairs_df(preference_pairs(ds, "prompt_key", "score", "resp_id", num_buckets=3)))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestMixtureResample:
    def _mk(self, sizes: dict, nblocks=5):
        rows = []
        i = 0
        for s, n in sizes.items():
            for _ in range(n):
                rows.append({"doc_id": i, "source": s})
                i += 1
        return rd.from_pandas(pd.DataFrame(rows)).repartition(nblocks)

    def test_quotas_exact(self, ray_session):
        from vaero_ray.stages.corpus import resample_to_mixture

        # limiting stratum: b (40/4=10 < 60/3=20 < 100/5=20)
        ds = self._mk({"a": 100, "b": 40, "c": 60})
        out = resample_to_mixture(
            ds, "doc_id", "source", {"a": 5, "b": 4, "c": 3}, num_buckets=3
        ).to_pandas()
        got = out.groupby("source").size().to_dict()
        assert got == {"a": 50, "b": 40, "c": 30}

    def test_unweighted_strata_dropped_and_invariant(self, ray_session):
        from vaero_ray.stages.corpus import resample_to_mixture

        outs = []
        for nblocks in (1, 9):
            ds = self._mk({"a": 30, "b": 10, "junk": 25}, nblocks=nblocks)
            out = resample_to_mixture(
                ds, "doc_id", "source", {"a": 1, "b": 1}, num_buckets=2
            ).to_pandas().sort_values("doc_id").reset_index(drop=True)
            outs.append(out)
        assert set(outs[0].source) == {"a", "b"}
        assert outs[0].groupby("source").size().to_dict() == {"a": 10, "b": 10}
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestQuantileBand:
    def test_bounds_and_filter(self, ray_session):
        from vaero_ray.stages.sketch import lhq_bins, quantile_band_bounds, quantile_band_filter

        vals = np.concatenate([np.arange(1, 101), np.array([100000] * 5)])
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
        lo, hi = quantile_band_bounds(ds, "v", 100, 900)
        # lo covers the 10th-percentile bin, hi excludes the giant outliers
        assert lo <= 11 and hi <= max(vals)
        kept = quantile_band_filter(ds, "v", 100, 900).to_pandas()["v"].to_numpy()
        assert kept.min() >= lo and kept.max() < hi
        assert 100000 not in kept
        # band bounds land on exact bin edges of the sketch
        assert lo == int(__import__("vaero_ray.stages.sketch", fromlist=["lhq_bounds"]).lhq_bounds(lhq_bins(np.array([lo])))[0][0])

    def test_band_is_shard_invariant(self, ray_session):
        from vaero_ray.stages.sketch import quantile_band_bounds

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 10000, 2000)
        got = {
            quantile_band_bounds(
                rd.from_pandas(pd.DataFrame({"v": vals})).repartition(nb), "v", 50, 950
            )
            for nb in (1, 13)
        }
        assert len(got) == 1


class TestOrderedEwma:
    def test_matches_sequential_reference(self, ray_session):
        from vaero_ray.stages.cep import ordered_ewma

        rng = np.random.default_rng(7)
        n = 400
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 9, n),
                "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="us"),
                "tie": np.arange(n),
                "v": rng.integers(0, 1000, n),
            }
        )
        out = (
            ordered_ewma(
                rd.from_pandas(df).repartition(5), "k", "ts", "v", "tie", 30, 100, num_buckets=3
            )
            .to_pandas()
            .set_index("k")
            .sort_index()
        )
        # python reference fold per key
        for k, g in df.sort_values(["ts", "tie"]).groupby("k"):
            e = None
            for v in g["v"]:
                e = v if e is None else (30 * v + 70 * e) // 100
            assert out.loc[k, "ewma"] == e
            assert out.loc[k, "n_events"] == len(g)

    def test_single_event_keys(self, ray_session):
        from vaero_ray.stages.cep import ordered_ewma

        df = pd.DataFrame(
            {"k": [1, 2], "ts": pd.to_datetime([1, 2], unit="s"), "tie": [0, 1], "v": [5, 9]}
        )
        out = ordered_ewma(rd.from_pandas(df), "k", "ts", "v", "tie", num_buckets=2).to_pandas()
        assert sorted(zip(out.k, out.ewma)) == [(1, 5), (2, 9)]


class TestSourceSimilarity:
    def test_identical_groups_agree_fully(self, ray_session):
        from vaero_ray.stages.sourcesim import NUM_PERM, source_similarity

        docs = ["the quick brown fox jumps over the lazy dog"] * 4
        df = pd.DataFrame({"source": ["a", "a", "b", "b"], "text": docs})
        out = source_similarity(rd.from_pandas(df).repartition(3), "source", "text").to_pandas()
        assert len(out) == 1
        assert out.iloc[0].n_agree == NUM_PERM and out.iloc[0].est_permille == 1000

    def test_disjoint_groups_agree_rarely(self, ray_session):
        from vaero_ray.stages.sourcesim import NUM_PERM, source_similarity

        rng = np.random.default_rng(5)
        mk = lambda pool: " ".join(rng.choice(pool, 60))
        a_pool = np.array([f"alpha{i}" for i in range(50)])
        b_pool = np.array([f"beta{i}" for i in range(50)])
        df = pd.DataFrame(
            {
                "source": ["a"] * 5 + ["b"] * 5,
                "text": [mk(a_pool) for _ in range(5)] + [mk(b_pool) for _ in range(5)],
            }
        )
        out = source_similarity(rd.from_pandas(df), "source", "text").to_pandas()
        assert out.iloc[0].n_agree < NUM_PERM // 4  # true Jaccard is 0

    def test_shard_invariant_registers(self, ray_session):
        from vaero_ray.stages.sourcesim import grouped_minhash_registers

        rng = np.random.default_rng(9)
        pool = np.array([f"w{i}" for i in range(30)])
        df = pd.DataFrame(
            {
                "source": rng.choice(["x", "y", "z"], 40),
                "text": [" ".join(rng.choice(pool, 20)) for _ in range(40)],
            }
        )
        sigs = []
        for nb in (1, 8):
            regs = grouped_minhash_registers(
                rd.from_pandas(df).repartition(nb), "source", "text"
            ).to_pandas().sort_values(["source", "perm"]).reset_index(drop=True)
            sigs.append(regs)
        pd.testing.assert_frame_equal(sigs[0], sigs[1])
