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
#   python -m pytest tests/ -m "not slow"   -> fast suite (< 5 min on the
#       1-vCPU reference rig; measured, see PROGRESS.md)
#   python -m pytest tests/                 -> full suite (nightly-style,
#       ~25 min on the same rig)
# Tests measured heavy on this rig are marked slow below; the fast tier
# still covers every component (each slow matrix keeps at least one fast
# representative).
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
    # round 4: everything measured > ~15 s on the 1-vCPU rig moves to
    # the nightly tier; each matrix keeps one fast representative
    # (versions: [4-0-4]; nonuniform: [yuv420p-wh1]; expand interpret:
    # [8-128]; parallel: the [0]-coder case; rice: the remaining whs)
    "test_device_encoder_nonuniform_geometry[bgr0",
    "test_device_encoder_nonuniform_geometry[yuv420p-wh0",
    "test_device_encoder_nonuniform_geometry[yuv420p-wh2",
    "test_device_encoder_nonuniform_geometry[yuv420p-wh3",
    "test_twopass_pass2_device_byte_exact",
    "test_device_encoder_versions_byte_exact[0-",
    "test_device_encoder_versions_byte_exact[1-",
    "test_device_encoder_versions_byte_exact[4-1",
    "test_device_encoder_v4_rgb_rct_search",
    "test_device_encoder_rgb48",
    "test_parallel_rgb_range",
    "test_parallel_matches_host_and_carries_state[1]",
    "test_sharded_packet_byte_identical",
    "test_sharded_front_matches_single",
    "test_device_rice_encoder_byte_exact[gray-wh1]",
    "test_vlc_pallas_interpret_matches_reference",
    "test_expand_pallas_interpret_matches_reference[16-",
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
