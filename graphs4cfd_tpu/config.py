"""Runtime configuration flags."""
from __future__ import annotations

import os

#: Route MLP chains through the Pallas fused kernel (TPU).  Resolved
#: lazily on first use; override with GRAPHS4CFD_USE_PALLAS=0/1 or by
#: setting ``use_pallas`` directly.
use_pallas = None


def ablation() -> str:
    """Profiling-only ablation switch (GRAPHS4CFD_ABLATE).

    Recognised values (see BASELINE.md ledger; numerics become WRONG, use
    only to attribute step time):

    * ``zero_vsg``   — drop the sender projection+gather path entirely.
    * ``bcast_vsg``  — replace the random sender gather with a contiguous
      broadcast (keeps all FLOPs/bytes except the index randomness).
    * ``serialize_halo`` — (graph-parallel; numerics UNCHANGED) barrier
      the halo ``all_to_all`` against the local-term compute so nothing
      overlaps the collective — the A/B control for measuring
      comm/compute overlap on real multi-chip meshes.
    """
    return os.environ.get("GRAPHS4CFD_ABLATE", "")


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
