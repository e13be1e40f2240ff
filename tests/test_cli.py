"""CLI smoke tests: encode/decode/psnr/info through the real entry point."""

import subprocess
import sys

import numpy as np
import pytest


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "ffmpeg_ffv2_tpu.cli",
                           *args], capture_output=True, text=True,
                          cwd="/root/repo")


@pytest.fixture(scope="module")
def raw_clip(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(0)
    w, h, n = 64, 48, 3
    path = td / "in.yuv"
    with open(path, "wb") as f:
        for t in range(n):
            y = ((np.indices((h, w)).sum(0) * 3 + t) % 256).astype(np.uint8)
            u = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
            v = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    return td, path, (w, h, n)


def test_cli_ffv1_roundtrip(raw_clip):
    td, path, (w, h, n) = raw_clip
    avi = td / "out.avi"
    dec = td / "dec.yuv"
    r = run_cli("encode", "-i", str(path), "-s", f"{w}x{h}",
                "-c", "ffv1", "-slices", "4", "-o", str(avi))
    assert r.returncode == 0, r.stderr
    r = run_cli("decode", "-i", str(avi), "-o", str(dec))
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == path.read_bytes()
    r = run_cli("psnr", str(path), str(dec))
    assert "PSNR:999.99" in r.stdout
    r = run_cli("info", "-i", str(avi))
    assert "version 3.4" in r.stdout and "slices=2x2" in r.stdout


def test_cli_ffv2_roundtrip(raw_clip):
    td, path, (w, h, n) = raw_clip
    # ffv2 needs 444/gray: make a gray clip from the y planes
    gray = td / "gray.raw"
    data = path.read_bytes()
    fsz = w * h * 3 // 2
    with open(gray, "wb") as f:
        for t in range(n):
            f.write(data[t * fsz:t * fsz + w * h])
    avi = td / "ffv2.avi"
    dec = td / "ffv2.raw"
    r = run_cli("encode", "-i", str(gray), "-s", f"{w}x{h}",
                "-pix_fmt", "gray", "-c", "ffv2",
                "-global_quality", "12", "-o", str(avi))
    assert r.returncode == 0, r.stderr
    r = run_cli("decode", "-i", str(avi), "-o", str(dec))
    assert r.returncode == 0, r.stderr
    assert len(dec.read_bytes()) == w * h * n


def test_cli_transcode_lossless(raw_clip):
    td, path, (w, h, n) = raw_clip
    out = td / "trans.yuv"
    r = run_cli("transcode", "-i", str(path), "-s", f"{w}x{h}",
                "-c", "ffv1", "-o", str(out))
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == path.read_bytes()


def test_cli_mkv_roundtrip(raw_clip):
    td, path, (w, h, n) = raw_clip
    mkv = td / "out.mkv"
    dec = td / "dec_mkv.yuv"
    r = run_cli("encode", "-i", str(path), "-s", f"{w}x{h}",
                "-c", "ffv1", "-level", "3", "-o", str(mkv))
    assert r.returncode == 0, r.stderr
    r = run_cli("decode", "-i", str(mkv), "-o", str(dec))
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == path.read_bytes()
    r = run_cli("info", "-i", str(mkv))
    assert "V_FFV1" in r.stdout


def test_cli_ya8_interleaved(raw_clip):
    """ya8 rawvideo is Y/A-interleaved on disk; the CLI must repack."""
    td, _, _ = raw_clip
    rng = np.random.RandomState(5)
    w, h = 32, 24
    raw = td / "ya.raw"
    raw.write_bytes(rng.randint(0, 256, (h, w, 2))
                    .astype(np.uint8).tobytes())
    avi = td / "ya.avi"
    dec = td / "ya_dec.raw"
    r = run_cli("encode", "-i", str(raw), "-s", f"{w}x{h}",
                "-pix_fmt", "ya8", "-c", "ffv1", "-level", "3",
                "-o", str(avi))
    assert r.returncode == 0, r.stderr
    r = run_cli("decode", "-i", str(avi), "-o", str(dec))
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == raw.read_bytes()


def test_cli_errors(raw_clip):
    td, path, (w, h, n) = raw_clip
    r = run_cli("encode", "-i", str(path), "-s", f"{w}x{h}",
                "-c", "nope", "-o", "/tmp/x.avi")
    assert r.returncode != 0
    assert "unknown codec" in (r.stdout + r.stderr)
