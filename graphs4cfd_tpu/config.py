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


#: Fast-path observability (VERDICT r3 weak #4): every dispatch site on
#: the hot path records which implementation it chose — at trace time for
#: jitted code (once per compiled program) and per batch for host-side
#: plan builders.  A silent fallback (plan failed to attach, ``supports``
#: declined) then shows up as an ``:xla`` entry instead of vanishing.
kernel_choices: dict = {}


#: > 0 → record_choice is a no-op.  collate_sharded runs exploratory
#: planning rounds whose per-shard attaches would otherwise double-count
#: (and claim a plan attached even when the consistency check later
#: discards it); it suppresses recording and reports the final stacked
#: decision once (ADVICE r4 #2).
_suppress_depth = 0


class suppress_choice_recording:
    """Context manager: drop record_choice calls inside the block."""

    def __enter__(self):
        global _suppress_depth
        _suppress_depth += 1
        return self

    def __exit__(self, *exc):
        global _suppress_depth
        _suppress_depth -= 1
        return False


def record_choice(site: str, choice: str) -> None:
    if _suppress_depth:
        return
    key = f"{site}:{choice}"
    kernel_choices[key] = kernel_choices.get(key, 0) + 1


def fast_path_report(reset: bool = False) -> dict:
    """Counters of dispatch decisions since the last reset.

    Keys are ``site:choice`` (e.g. ``gn_block:fused_wg``, ``wg_plan:w512``,
    ``fold_plan:none``).  bench.py emits this in its JSON line; ``fit``
    logs it once after the first epoch.
    """
    out = dict(sorted(kernel_choices.items()))
    if reset:
        kernel_choices.clear()
    return out


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
