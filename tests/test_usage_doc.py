"""USAGE.md is executable documentation: every fenced ```python block
runs verbatim, top to bottom, in one shared namespace with `spark` in
scope.  A snippet that drifts from the code fails CI — the same
no-drift contract the golden corpus gives the reference's demo
queries (/root/reference/README.md:50-66)."""

from __future__ import annotations

import os
import re

import pytest

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "USAGE.md")


def _blocks() -> list[tuple[int, str]]:
    text = open(_DOC).read()
    out = []
    for m in re.finditer(r"```python\n(.*?)```", text, flags=re.DOTALL):
        line = text[: m.start()].count("\n") + 2
        out.append((line, m.group(1)))
    return out


BLOCKS = _blocks()


def test_usage_doc_has_snippets():
    assert len(BLOCKS) >= 7, "USAGE.md lost its executable walkthrough"


@pytest.fixture(scope="module")
def _ns(spark):
    return {"spark": spark}


@pytest.mark.parametrize(
    "idx", range(len(BLOCKS)), ids=[f"block-L{line}" for line, _ in BLOCKS]
)
def test_usage_block(spark, _ns, idx):
    # blocks share state and must run in order; pytest preserves
    # parametrize order within a module, so each block sees its
    # predecessors' names
    line, code = BLOCKS[idx]
    exec(compile(code, f"USAGE.md:block@L{line}", "exec"), _ns)
