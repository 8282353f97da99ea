"""Offline embedding pipeline: numeric plumbing tests (no model
weights needed)."""

import numpy as np

from dream_gnn_tpu.data.embedding import combine_embeddings, fuzzy_name_map


def test_combine_pads_and_reduces(rng):
    a = rng.normal(size=(40, 768)).astype(np.float32)   # ChemBERTa-like
    b = rng.normal(size=(40, 1280)).astype(np.float32)  # ESM-2-like
    out = combine_embeddings([a, b], target_dim=768)
    assert out.shape == (80, 768)
    # Fewer samples than components -> rank-limited PCA, zero-padded.
    assert (np.abs(out[:, 80:]) < 1e-9).all()
    assert np.abs(out[:, :79]).sum() > 0


def test_combine_single_narrow_space(rng):
    a = rng.normal(size=(10, 100)).astype(np.float32)
    out = combine_embeddings([a], target_dim=768)
    assert out.shape == (10, 768)
    np.testing.assert_allclose(out[:, :100], a, rtol=1e-6)
    assert (out[:, 100:] == 0).all()


def test_fuzzy_name_map():
    candidates = {"Aspirin": "DB00945", "Ibuprofen": "DB01050",
                  "Paracetamol": "DB00316"}
    got = fuzzy_name_map(["aspirin", "ibuprofen", "ibuprofenn",
                          "completely-unrelated-xyz"], candidates)
    assert got["aspirin"] == "DB00945"
    assert got["ibuprofen"] == "DB01050"
    assert got["ibuprofenn"] == "DB01050"      # >= 0.8 ratio
    assert got["completely-unrelated-xyz"] is None


def test_mat_roundtrip(tmp_path):
    from dream_gnn_tpu.data.matio import load_mat, save_mat
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data

    raw = synthetic_raw_data(n_drug=12, n_dis=9, n_pos=15, seed=4)
    path = str(tmp_path / "tiny.mat")
    save_mat(path, raw)
    loaded = load_mat(path)
    np.testing.assert_array_equal(loaded.association, raw.association)
    np.testing.assert_allclose(loaded.drug_embed, raw.drug_embed,
                               rtol=1e-6)
    assert loaded.drug_ids == raw.drug_ids
