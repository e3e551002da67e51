"""Runtime configuration flags."""
from __future__ import annotations

import os

#: Route MLP chains through the Pallas fused kernel (TPU).  Resolved
#: lazily on first use; override with GRAPHS4CFD_USE_PALLAS=0/1 or by
#: setting ``use_pallas`` directly.
use_pallas = None


def pallas_enabled() -> bool:
    global use_pallas
    if use_pallas is None:
        env = os.environ.get("GRAPHS4CFD_USE_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false", "False")
        else:
            import jax
            use_pallas = jax.default_backend() == "tpu"
    return use_pallas
