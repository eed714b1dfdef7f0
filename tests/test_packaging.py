"""spark-submit --py-files packaging sanity."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def test_pyfiles_zip_is_self_contained(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    import importlib

    package = importlib.import_module("package")
    zip_path = package.build(tmp_path)
    # import the package from the zip alone (as executors would)
    code = (
        f"import sys; sys.path.insert(0, {str(zip_path)!r}); "
        "import otlp_cardinality_checker_spark as p; "
        "from otlp_cardinality_checker_spark.functions.masking import template_of; "
        "assert template_of('took 15ms') == 'took <DURATION>'; "
        "print('zip-import-ok')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so the zip must resolve
        timeout=60,
    )
    assert res.returncode == 0, res.stderr
    assert "zip-import-ok" in res.stdout
