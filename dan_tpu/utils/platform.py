"""ONE backend predicate for every Pallas-vs-XLA dispatch gate.

The axon TPU tunnel on this machine reports its platform as either 'tpu'
or 'axon' depending on the jax version/plugin; round-2 code had two
different predicates (postprocess accepted both, the vgg conv1 gate only
'tpu'), so a kernel-dispatch flag could silently fall back to XLA on one
backend name.  Every dispatch site imports this helper instead.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
