"""Package shipping for cluster submission.

The engine runs on a real cluster as ``spark-submit --py-files
optimizing_spark.zip job.py`` — the zip is added to every executor's
``sys.path``, so the same package code that drives local tests drives
the cluster job (reference analog: the single self-contained binary
the C++ engine ships as, Optimizing's README build/run flow).

``build_pyfiles_zip`` produces that artifact deterministically: only
``.py`` sources, stable ordering, fixed timestamps — so the artifact
hash is reproducible and a resubmitted job ships byte-identical code.
"""

from __future__ import annotations

import os
import zipfile

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles_zip(out_path: str, pkg_root: str | None = None) -> str:
    """Zip the ``optimizing_spark`` package for ``--py-files``.

    The archive stores paths as ``optimizing_spark/...`` so importing
    from the zip resolves exactly like importing from the repo root.
    Returns out_path.
    """
    root = os.path.abspath(pkg_root or _PKG_ROOT)
    pkg_name = os.path.basename(root)
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.join(pkg_name, os.path.relpath(full, root))
            members.append((full, rel))
    if not any(rel == f"{pkg_name}/__init__.py" or
               rel == os.path.join(pkg_name, "__init__.py")
               for _, rel in members):
        raise FileNotFoundError(f"{root} is not a package (no __init__.py)")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in members:
            # fixed date_time -> byte-reproducible artifact
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"),
                                   date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    os.replace(tmp, out_path)  # atomic: no half-written artifact
    return out_path


if __name__ == "__main__":  # python -m optimizing_spark.plans.shipping out.zip
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "dist/optimizing_spark.zip"
    print(build_pyfiles_zip(out))
