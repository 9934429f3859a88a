"""Docstring-coverage gate as a test (reference: pydocstyle CI workflow).

Mirrors /root/reference/.github/workflows/pydocstyle.yaml: the reference
fails CI when public API lacks docstrings; here the same contract runs in
the smoke tier via tools/check_docstrings.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))

from check_docstrings import missing_docstrings  # noqa: E402


def test_every_public_definition_has_a_docstring():
    gaps = missing_docstrings()
    assert not gaps, (
        f"{len(gaps)} public definitions lack docstrings "
        f"(first 20): {gaps[:20]}"
    )
