"""NodeTraversor / NodeFilter over the node table.

Reimplements the reference's filtered depth-first traversal
(/root/reference/ksoup/src/com/fleeksoft/ksoup/select/NodeTraversor.kt:87-129,
select/NodeFilter.kt): a head/tail visitor where head's verdict steers the
walk — CONTINUE descends, SKIP_CHILDREN skips the subtree but still tails,
SKIP_ENTIRELY skips subtree and tail, REMOVE detaches the node after moving
on, STOP aborts. The unfiltered visitor variant (NodeTraversor.traverse,
kt:22-65) is ``traverse``.
"""

from __future__ import annotations

from collections.abc import Callable

from .dom import Doc

CONTINUE = 0
SKIP_CHILDREN = 1
SKIP_ENTIRELY = 2
REMOVE = 3
STOP = 4


def traverse(doc: Doc, root: int,
             head: Callable[[int, int], None],
             tail: Callable[[int, int], None] | None = None) -> None:
    """NodeTraversor.traverse: head/tail visits in document order,
    tolerant of the visitor mutating the current node's children.

    The cursor is tracked by sibling IDENTITY (the set of already-visited
    child ids), not a raw index, mirroring the intent of the reference's
    sibling-pointer walk (NodeTraversor.kt:22-65): a visitor that detaches
    earlier siblings (e.g. merging adjacent text nodes), the current node,
    or any combination shifts indices but not identities, so no surviving
    sibling is silently skipped. Each child present when the parent's cursor
    reaches it is visited exactly once, in document order.
    """
    # frame: [node, visited_child_ids, head_done]
    stack: list[list] = [[root, set(), False]]
    while stack:
        frame = stack[-1]
        node = frame[0]
        if not frame[2]:
            frame[2] = True
            head(node, len(stack) - 1)
            if node != root and doc.parent[node] == -1:
                # visitor removed the current node: skip subtree and tail;
                # the parent frame re-locates by identity, no fixup needed
                stack.pop()
                continue
        nxt = -1
        for k in doc.children[node]:  # re-read: visitor may mutate
            if k not in frame[1]:
                nxt = k
                break
        if nxt != -1:
            frame[1].add(nxt)
            stack.append([nxt, set(), False])
            continue
        if tail is not None:
            tail(node, len(stack) - 1)
        stack.pop()


def filter_traverse(doc: Doc, root: int,
                    head: Callable[[int, int], int],
                    tail: Callable[[int, int], int] | None = None) -> int:
    """NodeTraversor.filter: head verdict steers the walk (see module doc).

    Returns the final FilterResult (STOP when aborted, else CONTINUE).
    REMOVE detaches the node from the doc after the walk moves past it.
    """
    stack: list[list] = [[root, 0, CONTINUE, False]]
    while stack:
        frame = stack[-1]
        node, ci, verdict, visited = frame
        if not visited:
            frame[3] = True
            verdict = head(node, len(stack) - 1)
            if verdict == STOP:
                return STOP
            frame[2] = verdict
            if verdict in (SKIP_ENTIRELY, REMOVE, SKIP_CHILDREN):
                frame[1] = len(doc.children[node])  # don't descend
            ci = frame[1]
        kids = doc.children[node]
        if ci < len(kids) and frame[2] == CONTINUE:
            frame[1] = ci + 1
            stack.append([kids[ci], 0, CONTINUE, False])
            continue
        stack.pop()
        v = frame[2]
        if v in (CONTINUE, SKIP_CHILDREN) and tail is not None:
            t = tail(node, len(stack))
            if t == STOP:
                return STOP
            if t == REMOVE:
                v = REMOVE
        if v == REMOVE and node != root:
            doc.detach(node)
            if stack:
                # the parent's child list shrank before its cursor
                stack[-1][1] -= 1
    return CONTINUE


# -- NodeIterator (nodes/NodeIterator.kt) ------------------------------------

# Kind-filter presets mirroring the reference's KClass filters: in the
# reference's object model Document extends Element and CDataNode extends
# TextNode, so an Element-typed iterator yields the document root and a
# TextNode-typed one yields CDATA sections (nodes/NodeIterator.kt:18-22).
from . import dom as _dom  # noqa: E402  (kept local to the iterator block)

KINDS_ALL = None
KINDS_ELEMENT = frozenset({_dom.DOCUMENT, _dom.ELEMENT})
KINDS_TEXT = frozenset({_dom.TEXT, _dom.CDATA})


class NodeIterator:
    """Document-order iterator over a node and its descendants that
    survives structural mutation of the tree mid-iteration
    (nodes/NodeIterator.kt:19-122): ``remove``/``replace_with``/``wrap``
    on the just-emitted node re-anchor the walk at the previously emitted
    node instead of derailing it.

    ``kinds`` filters emitted nodes by ``dom`` kind code (``KINDS_ELEMENT``,
    ``KINDS_TEXT``, or any frozenset of kinds); ``None`` yields every node.
    Mirrors the reference's generic type filter.
    """

    __slots__ = ("doc", "root", "_next", "current", "previous",
                 "current_parent", "kinds")

    def __init__(self, doc: Doc, start: int, kinds=KINDS_ALL) -> None:
        self.doc = doc
        self.kinds = kinds
        self.restart(start)

    def restart(self, start: int) -> None:
        """Re-aim at a new start node as if newly constructed
        (NodeIterator.kt:40-49)."""
        self._next = start if self._matches(start) else -1
        self.current = start
        self.previous = start
        self.root = start
        self.current_parent = self.doc.parent[start]

    def _matches(self, node: int) -> bool:
        return self.kinds is None or self.doc.kind[node] in self.kinds

    def has_next(self) -> bool:
        self._maybe_find_next()
        return self._next != -1

    def next(self) -> int:
        self._maybe_find_next()
        if self._next == -1:
            raise StopIteration
        result = self._next
        self.previous = self.current
        self.current = result
        self.current_parent = self.doc.parent[result]
        self._next = -1
        return result

    def remove(self) -> None:
        """Remove the last-emitted node from the tree
        (NodeIterator.kt:113-115); iteration recovers via ``previous``."""
        self.doc.detach(self.current)

    def _maybe_find_next(self) -> None:
        if self._next != -1:
            return
        # structural change detected (current removed or replaced):
        # redo from the previously emitted node (NodeIterator.kt:73-76)
        if self.current_parent != -1 and self.doc.parent[self.current] == -1:
            self.current = self.previous
        self._next = self._find_next_node()

    def _next_sibling(self, node: int) -> int:
        p = self.doc.parent[node]
        if p == -1:
            return -1
        sibs = self.doc.children[p]
        try:
            i = sibs.index(node)
        except ValueError:
            return -1
        return sibs[i + 1] if i + 1 < len(sibs) else -1

    def _find_next_node(self) -> int:
        """The reference's four-way cursor advance (NodeIterator.kt:79-105):
        descend first child, else finish at root, else next sibling, else
        pop ancestors until one has a next sibling."""
        doc = self.doc
        node = self.current
        while True:
            if doc.children[node]:
                node = doc.children[node][0]
            elif node == self.root:
                return -1
            else:
                ns = self._next_sibling(node)
                if ns != -1:
                    node = ns
                else:
                    while True:
                        node = doc.parent[node]
                        if node == -1 or node == self.root:
                            return -1
                        ns = self._next_sibling(node)
                        if ns != -1:
                            node = ns
                            break
            if self._matches(node):
                return node

    def __iter__(self):
        return self

    def __next__(self) -> int:
        try:
            return self.next()
        except StopIteration:
            raise


def node_stream(doc: Doc, start: int, kinds=KINDS_ALL):
    """Node.nodeStream() (Node.kt:678-690): lazy document-order sequence of
    ``start`` and its descendants, optionally kind-filtered. Backed by
    ``NodeIterator`` so it tolerates structural mutation mid-stream."""
    return iter(NodeIterator(doc, start, kinds))


def element_stream(doc: Doc, start: int):
    """Element.stream() (Element.kt:394-396): element-typed node stream
    (document root included — Document is an Element in the reference)."""
    return iter(NodeIterator(doc, start, KINDS_ELEMENT))
