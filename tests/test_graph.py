"""Graph builder parity with the reference's scipy/DGL construction."""

import numpy as np
import scipy.sparse as sp

from dream_gnn_tpu.graph.bipartite import build_enc_graph
from dream_gnn_tpu.graph.knn import feature_knn_graph, knn_sim_graph


def _reference_knn_graph(sim_matrix, k, symm=True):
    """Literal transcription of data_loader.py:278-310 semantics
    (scipy path) as an independent oracle."""
    sim_matrix = np.asarray(sim_matrix, np.float64)
    n = sim_matrix.shape[0]
    k_actual = min(k, n - 1)
    neighbor = np.argpartition(-sim_matrix, kth=k_actual, axis=1)[:, :k_actual]
    row_index = np.arange(n).repeat(k_actual)
    col_index = neighbor.reshape(-1)
    adj = sp.coo_matrix((np.ones(len(row_index)), (row_index, col_index)),
                        shape=(n, n))
    if symm:
        adj = adj + adj.T
        adj = adj.multiply(adj > 0)
    adj = adj + sp.eye(n)
    rowsum = np.array(adj.sum(1)).flatten()
    r_inv = np.power(rowsum, -1.0, where=rowsum != 0)
    r_inv[np.isinf(r_inv)] = 0.0
    return (sp.diags(r_inv) @ adj).toarray().astype(np.float32)


def test_knn_sim_graph_matches_reference(rng):
    sim = rng.random((40, 40)).astype(np.float32)
    sim = (sim + sim.T) / 2
    np.fill_diagonal(sim, 1.0)
    ours = np.asarray(knn_sim_graph(sim, k=4).a)
    ref = _reference_knn_graph(sim, k=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_knn_rows_sum_to_one(rng):
    sim = rng.random((25, 25)).astype(np.float32)
    a = np.asarray(knn_sim_graph(sim, k=3).a)
    np.testing.assert_allclose(a.sum(1), np.ones(25), rtol=1e-5)


def test_feature_knn_graph_cosine(rng):
    feats = rng.normal(size=(30, 16)).astype(np.float32)
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    sim = (feats / norms) @ (feats / norms).T
    ours = np.asarray(feature_knn_graph(feats, k=5).a)
    ref = _reference_knn_graph(sim, k=5)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_enc_graph_norms(rng):
    """ci/cj = 1/sqrt(degree summed over BOTH rating relations)
    (data_loader.py:453-488, parity trap §7.3.5)."""
    n_drug, n_dis = 12, 9
    # Every pair in-fold with random labels, minus a few dropped pairs.
    pairs = np.stack(np.meshgrid(np.arange(n_drug), np.arange(n_dis),
                                 indexing="ij")).reshape(2, -1)
    keep = rng.random(pairs.shape[1]) < 0.8
    pairs = pairs[:, keep]
    values = (rng.random(pairs.shape[1]) < 0.1).astype(np.float32)

    g = build_enc_graph(pairs, values, n_drug, n_dis, symm=True)

    deg_drug = np.zeros(n_drug)
    deg_dis = np.zeros(n_dis)
    for (i, j) in pairs.T:
        deg_drug[i] += 1   # one edge per rating relation, either 0 or 1
        deg_dis[j] += 1
    np.testing.assert_allclose(
        np.asarray(g.ci_drug)[:, 0],
        np.where(deg_drug > 0, 1.0 / np.sqrt(np.maximum(deg_drug, 1)), 0.0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.ci_dis)[:, 0],
        np.where(deg_dis > 0, 1.0 / np.sqrt(np.maximum(deg_dis, 1)), 0.0),
        rtol=1e-6)
    # symm=True: cj == ci (out-degrees mirror in-degrees over both dirs)
    np.testing.assert_allclose(np.asarray(g.cj_drug), np.asarray(g.ci_drug))

    # a0/a1 partition the mask
    a0 = np.asarray(g.a0())
    a1 = np.asarray(g.a1)
    mask = np.asarray(g.mask)
    assert ((a0 + a1) == mask).all()
    assert a1.sum() == values.sum()
    assert mask.sum() == pairs.shape[1]


def test_enc_graph_asymmetric_norm(rng):
    pairs = np.array([[0, 1, 2], [0, 1, 0]])
    values = np.array([1.0, 0.0, 1.0])
    g = build_enc_graph(pairs, values, 3, 2, symm=False)
    np.testing.assert_allclose(np.asarray(g.cj_drug), np.ones((3, 1)))
    np.testing.assert_allclose(np.asarray(g.cj_dis), np.ones((2, 1)))


def test_knn_graph_max_symm(rng):
    """utils.knn_graph variant: max-symmetrised binary adjacency."""
    from dream_gnn_tpu.graph.knn import knn_graph_max_symm

    sim = rng.random((20, 20)).astype(np.float32)
    a = knn_graph_max_symm(sim, k=3)
    np.testing.assert_array_equal(a, a.T)           # symmetric
    assert set(np.unique(a)) <= {0.0, 1.0}          # binary, no values 2
    assert (a.sum(1) >= 3).all()                    # at least k neighbors


def test_augmented_knn_graph(rng):
    from dream_gnn_tpu.graph.knn import augmented_knn_graph

    sim = rng.random((25, 25)).astype(np.float32)
    a = augmented_knn_graph(sim, k=4, dropout_rate=0.3, add_noise=True,
                            noise_scale=0.05,
                            rng=np.random.default_rng(0))
    np.testing.assert_array_equal(a, a.T)           # final max-symm
    assert (np.diag(a) >= 1.0).all()                # self-loops added
    off = a - np.eye(25)
    nz = off[off != 0]
    assert (nz >= 0.01 - 1e-6).all() and (nz <= 1.0 + 1e-6).all()


def test_loader_augment_features():
    import jax

    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data

    raw = synthetic_raw_data(n_drug=15, n_dis=10, n_pos=20, seed=8)
    ds = DreamDataset(raw, k=3)
    drug, dis = ds.augment_features(jax.random.key(0))
    assert drug.shape == ds.drug_feat.shape
    assert not np.array_equal(np.asarray(drug), np.asarray(ds.drug_feat))
    # masking zeroed some entries
    assert (np.asarray(drug) == 0).mean() > 0.03
