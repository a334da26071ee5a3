"""Distributed k-means (stages/ann.kmeans_fit / kmeans_assign): the
iterative-algorithm operator has no SQL oracle — pin convergence,
assignment consistency against a driver-side recompute, and determinism."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ethereum_raw_data_crawler_ray.stages.ann import (
    _normalize,
    kmeans_assign,
    kmeans_fit,
)


@pytest.fixture(scope="module")
def emb_ds(sf_dir, ray_session):
    import os

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _mat(ds):
    df = ds.to_pandas()
    return (
        np.asarray(df["embedding"].to_list(), dtype=np.float32),
        df["vec_id"].to_numpy(np.int64),
    )


def test_inertia_non_increasing(emb_ds):
    cent, hist = kmeans_fit(emb_ds, k=8, n_iter=6)
    assert cent.shape[0] == 8
    # spherical Lloyd's monotone up to float roundoff / empty-cell renorm
    assert all(b <= a + 1e-5 for a, b in zip(hist, hist[1:])), hist
    assert hist[-1] < hist[0]  # it actually improved


def test_assignment_matches_recompute(emb_ds):
    cent, _ = kmeans_fit(emb_ds, k=8, n_iter=4)
    out = kmeans_assign(emb_ds, cent).to_pandas().sort_values("vec_id")
    vecs, ids = _mat(emb_ds)
    sims = _normalize(vecs) @ _normalize(cent).T
    exp = sims.argmax(axis=1)
    order = np.argsort(ids)
    assert (out["cell"].to_numpy() == exp[order]).all()
    np.testing.assert_allclose(
        out["cosine"].to_numpy(),
        sims[np.arange(len(ids)), exp][order],
        rtol=1e-5,
    )


def test_deterministic(emb_ds):
    c1, h1 = kmeans_fit(emb_ds, k=5, n_iter=3)
    c2, h2 = kmeans_fit(emb_ds, k=5, n_iter=3)
    np.testing.assert_array_equal(c1, c2)
    assert h1 == h2


def test_k_exceeds_rows(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(31)
    tiny = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(5), "embedding": list(rng.normal(size=(5, 8)).astype(np.float32))}
        )
    )
    cent, hist = kmeans_fit(tiny, k=8, n_iter=3)
    assert cent.shape[0] <= 5
    out = kmeans_assign(tiny, cent).to_pandas()
    assert len(out) == 5 and out["cell"].between(0, cent.shape[0] - 1).all()


class TestGroupedCentroids:
    def test_exact_and_partition_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from ethereum_raw_data_crawler_ray.stages.ann import grouped_centroids

        rng = np.random.default_rng(7)
        n, dim = 2000, 8
        df = pd.DataFrame({
            "label": rng.integers(0, 5, n),
            "embedding": list(rng.normal(size=(n, dim)).astype(np.float32)),
        })
        outs = []
        for parts in (3, 11):
            out = grouped_centroids(rd.from_pandas(df).repartition(parts),
                                    group="label")
            outs.append(out)
        # exact int partials → bit-identical under any partitioning
        pd.testing.assert_frame_equal(outs[0], outs[1])
        out = outs[0]
        for lab, sub in df.groupby("label"):
            m = np.stack(sub["embedding"].to_numpy()).astype(np.float64) * 1e9
            sc = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
            want = sc.sum(axis=0)
            got = out[out["label"] == lab].sort_values("pos")
            assert (got["sum_sc"].to_numpy() == want).all()
            assert (got["n"] == len(sub)).all()
            assert np.allclose(got["centroid_sc"],
                               want / float(len(sub)), rtol=0, atol=0)

    def test_null_vectors_skipped(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as _pa
        import ray.data as rd

        from ethereum_raw_data_crawler_ray.stages.ann import grouped_centroids

        t = _pa.table({
            "label": _pa.array([1, 1, 2], type=_pa.int64()),
            "embedding": _pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                                   type=_pa.list_(_pa.float32())),
        })
        out = grouped_centroids(rd.from_arrow(t), group="label")
        assert out[out["label"] == 1]["n"].tolist() == [1, 1]  # null skipped
        assert out[out["label"] == 2]["sum_sc"].tolist() == [3_000_000_000,
                                                             4_000_000_000]
