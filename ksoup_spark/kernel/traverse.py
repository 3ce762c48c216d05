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
