"""Write per-fold AUPR distribution artifacts for protocol runs.

Usage: python scripts/aupr_distribution.py [results_dir ...]
Defaults to the three canonical v2 protocol runs.  Each run gets an
``aupr_distribution.json`` (basin centers/weights/quantiles) that the
regression gate (dream_gnn_tpu/eval/aupr_gate.py, round-1 VERDICT
weak #6) compares future runs against; the bands are also recorded in
BASELINE.md.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import sys

from dream_gnn_tpu.eval.aupr_gate import write_distribution

DEFAULT = ["results/Gdataset_full_v2", "results/Cdataset_full_v2",
           "results/lrssl_full_v2"]

for d in (sys.argv[1:] or DEFAULT):
    s = write_distribution(d)
    print(f"{d}: n={s['n']} lo={s['lo_center']:.3f}(w={s['lo_weight']:.2f}) "
          f"hi={s['hi_center']:.3f}(w={s['hi_weight']:.2f}) "
          f"p50={s['quantiles']['p50']:.3f}")
