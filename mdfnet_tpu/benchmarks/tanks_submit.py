"""Tanks & Temples submission packaging.

Twin of reference tools/tanks.log/upload_t2_results.py: the benchmark server
expects, per scene, a `<Scene>.ply` fused cloud and the dataset-provided
`<Scene>.log` camera trajectory, plus an MD5 manifest. The reference uploads
to a GCS bucket; this environment has no egress, so this module packages the
pair set + checksums into a submission directory ready for upload.
"""
from __future__ import annotations

import hashlib
import os
import shutil
from typing import Dict, Sequence

INTERMEDIATE = ("Family", "Francis", "Horse", "Lighthouse", "M60", "Panther",
                "Playground", "Train")
ADVANCED = ("Auditorium", "Ballroom", "Courtroom", "Museum", "Palace", "Temple")


def md5_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def package_submission(ply_dir: str, log_dir: str, out_dir: str,
                       scenes: Sequence[str] = INTERMEDIATE + ADVANCED,
                       log_fn=print) -> Dict[str, str]:
    """Collect <scene>.ply + <scene>.log pairs into out_dir with an MD5
    manifest (the format generate_md5_file produces in the reference)."""
    os.makedirs(out_dir, exist_ok=True)
    sums = {}
    for scene in scenes:
        ply = os.path.join(ply_dir, f"{scene}.ply")
        log = os.path.join(log_dir, f"{scene}.log")
        if not os.path.exists(ply):
            if log_fn:
                log_fn(f"skip {scene}: no {ply}")
            continue
        if not os.path.exists(log):
            raise FileNotFoundError(
                f"{scene}.log missing — the camera trajectory ships with the "
                f"T&T dataset and must sit in {log_dir}")
        shutil.copy2(ply, os.path.join(out_dir, f"{scene}.ply"))
        shutil.copy2(log, os.path.join(out_dir, f"{scene}.log"))
        sums[f"{scene}.ply"] = md5_of(ply)
        sums[f"{scene}.log"] = md5_of(log)

    manifest = os.path.join(out_dir, "md5.txt")
    with open(manifest, "w") as f:
        for name, digest in sorted(sums.items()):
            f.write(f"{digest}  {name}\n")
    if log_fn:
        log_fn(f"packaged {len(sums) // 2} scenes -> {out_dir}")
    return sums
