

def test_vector_norms_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ethereum_raw_data_crawler_ray.stages.ann import vector_norms

    rng = np.random.default_rng(61)
    n, d = 200, 16
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "label": rng.integers(0, 4, n).astype(np.int64),
        "embedding": [v for v in vecs],
    })
    out = (vector_norms(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    sc = np.sign(vecs.astype(np.float64) * 1e6) * np.floor(
        np.abs(vecs.astype(np.float64) * 1e6) + 0.5)
    n2 = (sc.astype(np.int64) ** 2).sum(axis=1)
    assert np.array_equal(out["norm2_sc"].to_numpy(), n2)
    assert np.array_equal(out["norm"].to_numpy(),
                          np.sqrt(n2.astype(np.float64)) / 1e6)
    # overflow guard fails loud
    big = pd.DataFrame({"vec_id": [0], "label": [0],
                        "embedding": [np.full(64, 4e3, np.float32)]})
    with pytest.raises(Exception, match="overflow"):
        vector_norms(rd.from_pandas(big)).to_pandas()
