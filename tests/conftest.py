import os
import sys

# Two platform modes:
#  * default       — virtual 8-device CPU mesh (deterministic, fast
#    interpret-mode pallas; multi-chip sharding tests run here).  The
#    environment pins jax_platforms to the axon TPU plugin regardless
#    of JAX_PLATFORMS, so force CPU through the config API as well.
#  * FFV1_TPU_TIER=1 — the on-chip tier: run tests marked `device` on
#    the real TPU (byte-exactness gate; see test_tpu_gate.py).  Uses
#    the repo-local persistent compilation cache so a warm run is
#    minutes, not hours:  FFV1_TPU_TIER=1 python -m pytest -m device
_TPU_TIER = os.environ.get("FFV1_TPU_TIER") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


# ---------------------------------------------------------------------------
# Speed tiers (markers registered in pyproject.toml):
#   python -m pytest tests/ -m "not slow"   -> fast suite
#   python -m pytest tests/                 -> full suite (nightly-style)
# Tests measured >5 s on the reference rig are auto-marked slow; the fast
# tier still covers every component (each slow matrix keeps at least one
# fast representative).
# ---------------------------------------------------------------------------

_SLOW_PATTERNS = (
    "test_adapt_pallas_interpret_matches_reference",
    "test_shift_compact_expand_randomized",
    "test_device_encoder_batch_intra",
    "test_device_encoder_byte_exact",
    "test_device_encoder_mega_groups_small_gcap",
    "test_render_bytes_fast_matches_slow",
    "test_render_bytes_matches_compact_lane",
    "test_native_matches_python",
    "test_native_session_reuse",
    "test_cli_ffv2_roundtrip",
    "test_cli_ffv1_roundtrip",
    "test_cli_mkv_roundtrip",
    "test_ffv2_ours_to_reference",
    "test_fate_golden_rgb",
    "test_ffv2_split_tree_to_reference",
    "test_pallas_sort_large_random",
)


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if any(item.name.startswith(p) or p in item.name
               for p in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
        if item.get_closest_marker("device") and not _TPU_TIER:
            item.add_marker(pytest.mark.skip(
                reason="on-chip tier: set FFV1_TPU_TIER=1 and run on "
                       "the real TPU"))
