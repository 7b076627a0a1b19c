"""ONE backend predicate for every Pallas-vs-XLA dispatch gate.

The axon TPU tunnel on this machine reports its platform as either 'tpu'
or 'axon' depending on the jax version/plugin; round-2 code had two
different predicates (postprocess accepted both, vgg only 'tpu'), so a
flag like conv1_pallas_infer could silently fall back to XLA on one
backend name.  Every dispatch site imports this helper instead.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
