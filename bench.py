"""Headline benchmark: ETC1S encode throughput (Mpix/s) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is our Mpix/s divided by the reference C++ encoder's single-CPU
Mpix/s on the same machine/config (BASELINE.json north star: >= 20x).

Config matches BASELINE.json config 1: ETC1S encode of kodim images at
quality 128, effort/comp-level 1 (the reference CLI default).
"""

import json
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

TEST_FILES = pathlib.Path("/root/reference/test_files")
ORACLE = pathlib.Path("/tmp/refbuild/basisu")
# reference C++ (-q 128, comp level 1, single thread, this machine),
# measured from its own printed compression time on kodim23 (0.393 Mpix):
FALLBACK_CPU_MPIX_S = 0.59


def _ensure_oracle() -> bool:
    """Build the reference CLI into /tmp/refbuild when it is absent so
    vs_baseline is a LIVE measurement, not the recorded constant. The
    build drops basisu into /root/reference/bin; move it out and keep the
    reference tree pristine."""
    if ORACLE.exists():
        return True
    ref = pathlib.Path("/root/reference")
    if not (ref / "CMakeLists.txt").exists():
        return False
    try:
        ORACLE.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["cmake", str(ref), "-DCMAKE_BUILD_TYPE=Release",
             "-DBASISU_SSE=OFF", "-GNinja"],
            cwd=ORACLE.parent, check=True, capture_output=True, timeout=300)
        subprocess.run(["ninja", "basisu"], cwd=ORACLE.parent, check=True,
                       capture_output=True, timeout=1200)
        built = ref / "bin" / "basisu"
        if built.exists():
            ORACLE.write_bytes(built.read_bytes())
            ORACLE.chmod(0o755)
            built.unlink()
        return ORACLE.exists()
    except Exception as exc:
        print(f"note: oracle build failed: {exc}", file=sys.stderr)
        return False

# 16 images: the batched pipeline's fill/drain tails (first upload, last
# fetch + host entropy) amortize with depth; the reference CPU baseline is
# measured per-image on the same files, so the comparison stays apples-to-
# apples (throughput at steady state)
IMAGES = [f"kodim{i:02}.png" for i in range(1, 17)]


def _load_images():
    from PIL import Image

    imgs = []
    for name in IMAGES:
        p = TEST_FILES / name
        if p.exists():
            imgs.append(np.asarray(Image.open(p).convert("RGB")))
    if not imgs:
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (512, 768, 3), dtype=np.uint8)]
    return imgs


def _measure_ours(imgs):
    from basis_universal_tpu import compressor

    params = compressor.CompressorParams(quality_level=128, effort=1)
    # warm-up / compile (covers both orientations' device programs)
    compressor.compress_batch(imgs, params)
    best = 0.0
    for _ in range(4):
        t0 = time.time()
        compressor.compress_batch(imgs, params)
        dt = time.time() - t0
        best = max(best, sum(i.shape[0] * i.shape[1] for i in imgs) / 1e6 / dt)
    return best


def _measure_ours_uastc(imgs):
    """UASTC LDR 4x4 encode Mpix/s (the north star is ETC1S+UASTC,
    BASELINE.md:6); recorded as extra keys on the headline JSON line.
    Uses the batched pipeline (basis_parallel_compress analog), same as
    the ETC1S headline."""
    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import BasisTexFormat

    params = compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=2)
    compressor.compress_batch(imgs, params)      # warm-up / compile
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        compressor.compress_batch(imgs, params)
        dt = time.time() - t0
        best = max(best, sum(i.shape[0] * i.shape[1] for i in imgs) / 1e6 / dt)
    return best


def _measure_reference_uastc(imgs_paths):
    if not ORACLE.exists():
        return None
    total_pix, total_t = 0, 0.0
    for name in imgs_paths[:2]:
        p = TEST_FILES / name
        if not p.exists():
            continue
        best = None
        for _ in range(3):
            r = subprocess.run(
                [str(ORACLE), str(p), "-uastc", "-uastc_level", "2",
                 "-basis"],
                cwd="/tmp", capture_output=True, text=True, timeout=600)
            m = re.search(r"in ([0-9.]+) secs", r.stdout)
            if not m:
                return None
            t = float(m.group(1))
            best = t if best is None else min(best, t)
        from PIL import Image

        w, h = Image.open(p).size
        total_pix += w * h
        total_t += best
    if total_t <= 0:
        return None
    return total_pix / 1e6 / total_t


def _measure_reference(imgs_paths):
    """Reference CPU Mpix/s from the tool's own printed compression time.

    Per-image best-of-3: machine noise swings single runs by ~30%, and the
    FASTEST reference run is the conservative baseline for vs_baseline."""
    if not ORACLE.exists():
        return None
    total_pix, total_t = 0, 0.0
    for name in imgs_paths:
        p = TEST_FILES / name
        if not p.exists():
            continue
        best = None
        for _ in range(3):
            r = subprocess.run(
                [str(ORACLE), str(p), "-q", "128", "-basis"],
                cwd="/tmp", capture_output=True, text=True, timeout=600)
            m = re.search(r"in ([0-9.]+) secs", r.stdout)
            if not m:
                return None
            t = float(m.group(1))
            best = t if best is None else min(best, t)
        from PIL import Image

        w, h = Image.open(p).size
        total_pix += w * h
        total_t += best
    if total_t <= 0:
        return None
    return total_pix / 1e6 / total_t


def main():
    imgs = _load_images()
    ours = _measure_ours(imgs)
    _ensure_oracle()
    ref = _measure_reference(IMAGES)
    baseline_source = "live"
    if ref is None:
        ref = FALLBACK_CPU_MPIX_S
        baseline_source = "recorded"
        print(f"note: using recorded CPU baseline {ref} Mpix/s", file=sys.stderr)
    else:
        print(f"reference CPU: {ref:.3f} Mpix/s", file=sys.stderr)
    row = {
        "metric": "etc1s_encode_throughput",
        "value": round(ours, 4),
        "unit": "Mpix/s",
        "vs_baseline": round(ours / ref, 4),
        "baseline_source": baseline_source,
    }
    try:
        u_ours = _measure_ours_uastc(imgs)
        u_ref = _measure_reference_uastc(IMAGES)
        row["uastc_mpix_s"] = round(u_ours, 4)
        if u_ref:
            row["uastc_vs_cpu"] = round(u_ours / u_ref, 4)
    except Exception as exc:  # UASTC numbers are informational extras
        print(f"note: uastc bench skipped: {exc}", file=sys.stderr)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
