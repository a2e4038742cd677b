"""Build the ``--py-files`` deployment artifact: a zip of the package's
``.py`` sources that ``spark-submit --py-files dist/mysql_data_quality_spark.zip``
ships to every executor (the standard PySpark cluster deployment unit —
no wheel build or pip needed on the cluster).

Deterministic: fixed file order, fixed zip timestamps — byte-identical
output for identical sources, so the artifact can be content-addressed
by CI caches.

Usage: python scripts/build_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "mysql_data_quality_spark"
# fixed (y, m, d, h, m, s) so rebuilds of identical sources are
# byte-identical (zip stores mtimes; real mtimes break determinism)
EPOCH = (2020, 1, 1, 0, 0, 0)


def build(out: Path) -> list[str]:
    sources = sorted(
        p
        for p in (REPO / PKG).rglob("*.py")
        if "__pycache__" not in p.parts
    )
    if not sources:
        raise SystemExit(f"no sources under {REPO / PKG}")
    out.parent.mkdir(parents=True, exist_ok=True)
    names = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sources:
            arc = str(src.relative_to(REPO))
            info = zipfile.ZipInfo(arc, date_time=EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, src.read_bytes())
            names.append(arc)
    return names


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "dist" / f"{PKG}.zip"
    )
    names = build(out)
    print(f"{out}: {len(names)} files, {out.stat().st_size} bytes")
