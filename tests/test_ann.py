

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


def test_vector_norms_degenerate_payloads(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ethereum_raw_data_crawler_ray.stages.ann import vector_norms

    # empty list: the oracle's unnest emits no rows -> id omitted
    df = pd.DataFrame({
        "vec_id": [0, 1],
        "label": [0, 1],
        "embedding": [np.array([], np.float32),
                      np.array([3.0, 4.0], np.float32)],
    })
    out = vector_norms(rd.from_pandas(df)).to_pandas()
    assert out["vec_id"].tolist() == [1]
    assert out.loc[0, "norm2_sc"] == (3_000_000**2 + 4_000_000**2)
    # a coordinate whose SCALED magnitude passes 2^63 must fail loud
    # BEFORE the int64 cast can wrap it (guard on float magnitudes)
    huge = pd.DataFrame({"vec_id": [0], "label": [0],
                         "embedding": [np.array([1e13, 1.0, 2.0],
                                                np.float32)]})
    with pytest.raises(Exception, match="overflow"):
        vector_norms(rd.from_pandas(huge)).to_pandas()
    # ragged embeddings break the fixed-dim matrix contract -> loud
    ragged = pd.DataFrame({"vec_id": [0, 1], "label": [0, 0],
                           "embedding": [np.ones(2, np.float32),
                                         np.ones(3, np.float32)]})
    with pytest.raises(Exception, match="ragged"):
        vector_norms(rd.from_pandas(ragged)).to_pandas()
