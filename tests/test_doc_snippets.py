"""Docs build on the real API (VERDICT r2 item 8): every ```python block
in the runnable guides executes, cumulatively per file (later blocks may
use names defined by earlier ones)."""

import pathlib
import re

import pytest

DOCS = pathlib.Path(__file__).resolve().parents[1] / "docs"

# guides whose snippets promise to run as-is
RUNNABLE = ["power_noise.md", "freeu.md", "advanced_noise.md",
            "wavelet_cfg.md", "models.md"]

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(name):
    return _BLOCK.findall((DOCS / name).read_text())


@pytest.mark.parametrize("name", RUNNABLE)
def test_doc_snippets_run(name):
    blocks = _blocks(name)
    assert blocks, f"{name} has no python blocks"
    ns: dict = {}
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"{name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"{name} block {i} failed: {e}\n---\n{code}") from e
