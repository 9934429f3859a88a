"""The reference's entire public import surface must resolve on ``dynode``.

The reference (CDCgov/DynODE) declares its user-facing API in each
subpackage ``__init__.__all__`` (/root/reference/src/dynode/__init__.py
and config/infer/simulation/typing/utils). ``tools/check_parity.py``
AST-parses those lists (the reference's deps aren't installed, so it is
never imported) and resolves every name on this repo's ``dynode``
compatibility alias — the drop-in-migration contract PARITY.md documents,
enforced here so surface drift fails CI.
"""

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]
REFERENCE = Path("/root/reference/src/dynode")

sys.path.insert(0, str(REPO_ROOT / "tools"))

from check_parity import missing_names, reference_surface  # noqa: E402

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not present"
)


def test_reference_surface_is_nontrivial():
    surface = reference_surface(REFERENCE)
    # the reference ships ~120 public names across 6 __all__ lists; a
    # collapse here means the parser broke, not that the API shrank.
    assert sum(len(v) for v in surface.values()) >= 100
    assert set(surface) == {
        "", "config", "infer", "simulation", "typing", "utils",
    }


def test_every_reference_name_resolves_on_dynode_alias():
    gaps = missing_names(REFERENCE, alias="dynode")
    assert gaps == {}, f"reference API names missing from dynode: {gaps}"
