"""Manifest sanity for the consolidated scale suite (tools/scale_suite.py):
the cells SCALE.md's tables cite must exist, be callable, and be reachable
from the group aliases — a rename or a dropped cell should fail here, not
when someone tries to re-measure a table."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import scale_suite  # noqa: E402


def test_manifest_cells_are_callable_and_documented():
    assert scale_suite.MANIFEST
    for name, (fn, reqs, desc) in scale_suite.MANIFEST.items():
        assert callable(fn), name
        assert isinstance(desc, str) and desc, name
        # reqs are per-TABLE "dir/table" markers (ADVICE r7: a partial
        # corpus must skip cells needing the missing table, so the gate
        # requires all() of these): each must name a known corpus dir
        # and a known table
        for r in reqs:
            d, t = r.rsplit("/", 1)
            assert d in (scale_suite.X10, scale_suite.X100), (name, r)
            assert t in ("documents", "events", "embeddings"), (name, r)
    # every non-build cell declares at least one required table
    for name, (_fn, reqs, _desc) in scale_suite.MANIFEST.items():
        if not name.startswith("build_"):
            assert reqs, name


def test_groups_reference_existing_cells():
    for group, members in scale_suite.GROUPS.items():
        assert members, group
        for m in members:
            assert m in scale_suite.MANIFEST, (group, m)
    # the cells SCALE.md cites by name
    for cited in (
        "dedup_x10", "streams_x10", "dedup_x100", "ann_x100",
        "streams_x100", "recall_denominator_x100", "lsh_bucket_cap_x100",
    ):
        assert cited in scale_suite.MANIFEST, cited


def test_list_mode_exits_zero(capsys):
    assert scale_suite.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "all_x100" in out and "recall_denominator_x100" in out


def test_unknown_cell_rejected():
    assert scale_suite.main(["no_such_cell"]) == 2
