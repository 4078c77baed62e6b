"""Build the spark-submit ``--py-files`` artifact (dist/pkg.zip).

North-rule deployment unit: the whole engine ships to executors as ONE
zip importable via zipimport (no package resources are loaded through
``__file__``, so nothing needs extraction on the worker side). The zip is
DETERMINISTIC — sorted member order, fixed timestamps, fixed permissions —
so the same source tree always produces a byte-identical artifact; that
makes the artifact itself content-addressable, which is what lets a
cluster deploy be fingerprinted the same way the pipeline fingerprints
its input (jobs/run_quality_pipeline.py:source_fingerprint).

Usage:
    python tools/build_pyfiles.py [--out dist/pkg.zip]
    spark-submit --py-files dist/pkg.zip jobs/run_quality_pipeline.py ...
"""

from __future__ import annotations

import argparse
import hashlib
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "data_quality_check_pipeline_spark"


def build(out_path: str | None = None, repo: str = REPO) -> str:
    """Zip the package for --py-files; returns the artifact path."""
    out_path = out_path or os.path.join(repo, "dist", "pkg.zip")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    members: list[tuple[str, str]] = []
    for root, dirs, names in os.walk(os.path.join(repo, PACKAGE)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for n in names:
            if n.endswith(".py"):
                full = os.path.join(root, n)
                members.append((full, os.path.relpath(full, repo)))
    members.sort(key=lambda m: m[1])
    with zipfile.ZipFile(out_path, "w") as z:
        for full, arc in members:
            # fixed metadata => byte-identical zip for identical sources
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    return out_path


def artifact_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    path = build(args.out)
    print(f"{path}  sha256={artifact_sha256(path)}")


if __name__ == "__main__":
    main()
