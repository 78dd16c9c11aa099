"""Persistent XLA compilation cache for this repo's entry points.

Remote (tunneled) TPU compiles in this environment are pathologically
noisy: the SAME train-step HLO was observed compiling in anywhere from
6.5s to 120s across runs, depending on the compile service's momentary
load. JAX's persistent compilation cache removes the re-compile
entirely — the serialized executable round-trips correctly through the
``axon`` plugin (verified: 0.74s cold → 0.05s warm across processes) —
so benchmarks and CLI runs stop paying the noise after the first run.

This is deliberately opt-in per entry point (bench, CLI, driver entry,
test conftest) rather than on library import: a library should not
mutate process-global JAX config as an import side effect.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local dir.

    Safe to call more than once and at any time before the compiles it
    should capture; failures (read-only fs, old jax) are non-fatal.
    """
    import jax

    path = cache_dir or os.environ.get("PPNP_TPU_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Default thresholds skip exactly the small-but-noisy compiles we
        # care about on the tunneled platform; capture everything ≥0.5s.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # pragma: no cover - defensive
        pass
