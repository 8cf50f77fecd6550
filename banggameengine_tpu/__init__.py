"""banggameengine_tpu — a TPU-native simulation/game engine in JAX.

Brand-new implementation of the capabilities of the reference C++ engine
Skeletus/BangGameEngine (ECS + Bullet physics + bgfx renderer; see SURVEY.md):
structure-of-arrays world state in HBM, jitted physics/transform/render
pipelines, vmapped many-world simulation, pjit/shard_map scaling over TPU
meshes.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache under the repo.

    Fresh compiles through the tunneled TPU runtime take minutes; the
    on-disk cache makes every subsequent process start (benches, the
    driver, profiling scripts) reuse them.  Opt out with
    ``BANG_NO_COMP_CACHE=1``.
    """
    if _os.environ.get("BANG_NO_COMP_CACHE"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # XLA:CPU AOT cache entries are machine-feature pinned and reload
        # with SIGILL-risk warnings; the cache's value is the minutes-long
        # tunnel TPU compiles, so keep it off for forced-CPU runs (tests,
        # dryruns)
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # never block import on cache issues


_enable_compilation_cache()


def _force_f32_matmuls() -> None:
    """f32-exact matmul precision engine-wide.

    TPU MXU matmuls default to rounding f32 operands to bf16 (~3 decimal
    digits).  The engine leans on matmul CONTRACTIONS as data movement —
    one-hot compaction/selection of f32 payload rows (solver partner
    velocities, warm-start impulse matching, the deferred shade resolve)
    — where bf16 rounding silently corrupts the payload: measured on
    chip, one engine step diverged 1.1e-2 in contact-impulse velocity
    between the flat and vmapped many-world layouts (identical math,
    different contraction shapes) purely from operand rounding.  With
    ``highest`` (the exact 3x-bf16 decomposition) the layouts agree to
    1e-6 and every one-hot select returns its f32 rows bit-exactly.
    Physics parity with the f32 Bullet reference requires this; the few
    throughput-critical matmuls are small enough that the extra MXU
    passes never show up in the benches.  Callers wanting bf16 speed in
    their own code can locally override with
    ``jax.default_matmul_precision('default')``.
    """
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass


_force_f32_matmuls()

from banggameengine_tpu import math3d  # noqa: F401
from banggameengine_tpu.state import (  # noqa: F401
    InputFrame,
    StaticScene,
    StepEvents,
    WorldState,
)
