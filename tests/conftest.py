import os
import sys

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.  The
# environment pins jax_platforms to the axon TPU plugin regardless of
# JAX_PLATFORMS, so force CPU through the config API as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Speed tiers (markers registered in pyproject.toml):
#   python -m pytest tests/ -m "not slow"   -> fast suite, ~2 min hostside
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
