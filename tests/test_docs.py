"""Execute the code blocks in docs/SWITCHING.md against the real library.

The switching guide promises a reference user that every ``python`` block
works as written; this runs them in order in one shared namespace (the
guide is a single narrative) so the doc can never silently rot.
"""

import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "SWITCHING.md"


def test_switching_guide_blocks_run():
    text = DOC.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert len(blocks) >= 3, "guide lost its executable blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"SWITCHING.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(
                f"SWITCHING.md block {i} failed: {e!r}\n---\n{block}") from e
