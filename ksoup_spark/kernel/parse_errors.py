"""Parse-error tracking (reference parser/ParseError.kt,
ParseErrorList.kt, Parser.kt:92-107).

Errors are stored pre-formatted as the reference's ParseError.toString()
form — ``<line:col>: message`` with 1-based line/col — so they serialize
straight into DataFrame string columns. The list is bounded by max_size
(Parser.setTrackErrors semantics; 0 disables tracking entirely).
"""

from __future__ import annotations

from bisect import bisect_right


class ParseErrorList(list):
    """Bounded list of formatted parse errors for one document."""

    __slots__ = ("max_size", "_src", "_nl")

    def __init__(self, max_size: int = 0, source: str = ""):
        super().__init__()
        self.max_size = max_size
        self._src = source
        self._nl: list[int] | None = None  # lazy newline index

    def can_add(self) -> bool:
        return len(self) < self.max_size

    def add_at(self, pos: int, msg: str) -> None:
        """Record an error at absolute char offset `pos` (0-based)."""
        if len(self) >= self.max_size:
            return
        line, col = self._line_col(pos)
        self.append(f"<{line}:{col}>: {msg}")

    def _line_col(self, pos: int) -> tuple[int, int]:
        if self._nl is None:
            self._nl = [i for i, c in enumerate(self._src) if c == "\n"]
        ln = bisect_right(self._nl, pos - 1)
        start = self._nl[ln - 1] + 1 if ln else 0
        return ln + 1, pos - start + 1
