"""Build the --py-files artifact for spark-submit deployment.

    python scripts/package.py            # -> dist/otlp_cardinality_checker_spark.zip
    spark-submit --py-files dist/otlp_cardinality_checker_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        your_job.py

The package is pure Python (no native deps beyond pyspark/pandas/pyarrow,
which clusters ship), so one zip is the whole deployment unit.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "otlp_cardinality_checker_spark"


def build(out_dir: Path | None = None) -> Path:
    out_dir = out_dir or ROOT / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / f"{PKG}.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((ROOT / PKG).rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
