"""Faithful Python model of Rust std's BinaryHeap, for differential-testing
the Huffman tree build (reference src/huf.rs:96-117).

Models the three tie-relevant behaviors of the std implementation:

* ``from_iter``/heapify: bottom-up ``sift_down`` over ``(0..n/2).rev()``;
* ``push``: append + ``sift_up`` that stops on ``element <= parent``
  (strictly-greater elements move up);
* ``pop``: swap the last element into the root + ``sift_down_to_bottom``
  (walk the root hole down along the larger-child path — the RIGHT child on
  ties — to a leaf, then sift the moved element back up).

Elements are compared with a caller comparator; the reference's ``Suffix``
compares frequencies REVERSED (min-heap via max-heap, huf.rs:79-85), ties
``Equal``.
"""

from __future__ import annotations


class RustBinaryHeap:
    def __init__(self, items, gt):
        """gt(a, b) -> True iff a orders strictly greater than b."""
        self._gt = gt
        self.data = list(items)
        for i in reversed(range(len(self.data) // 2)):
            self._sift_down(i)

    def __len__(self):
        return len(self.data)

    def push(self, item):
        self.data.append(item)
        self._sift_up(0, len(self.data) - 1)

    def pop(self):
        data = self.data
        item = data.pop()
        if data:
            item, data[0] = data[0], item
            self._sift_down_to_bottom(0)
        return item

    def _sift_up(self, start: int, pos: int) -> int:
        data, element = self.data, self.data[pos]
        while pos > start:
            parent = (pos - 1) // 2
            if not self._gt(element, data[parent]):  # element <= parent
                break
            data[pos] = data[parent]
            pos = parent
        data[pos] = element
        return pos

    def _sift_down(self, pos: int) -> None:
        """std's sift_down_range: stop once element >= both children."""
        data, gt = self.data, self._gt
        end = len(data)
        element = data[pos]
        child = 2 * pos + 1
        while child + 1 < end:
            # pick the greater child; the right one on ties (data[child] <= data[child+1])
            if not gt(data[child], data[child + 1]):
                child += 1
            if not gt(data[child], element):  # element >= child: done
                data[pos] = element
                return
            data[pos] = data[child]
            pos = child
            child = 2 * pos + 1
        if child < end and gt(data[child], element):
            data[pos] = data[child]
            pos = child
        data[pos] = element

    def _sift_down_to_bottom(self, pos: int) -> None:
        data, gt = self.data, self._gt
        end = len(data)
        start = pos
        element = data[pos]
        child = 2 * pos + 1
        while child + 1 < end:
            if not gt(data[child], data[child + 1]):
                child += 1
            data[pos] = data[child]
            pos = child
            child = 2 * pos + 1
        if child < end:
            data[pos] = data[child]
            pos = child
        data[pos] = element
        self._sift_up(start, pos)


def reference_huffman_lengths(freq_items):
    """Code length per symbol from the reference's exact build
    (huf.rs:96-117): BinaryHeap::from_iter over the given item order, pop
    two, compose (first pop = left), push the merge, repeat.

    freq_items: iterable of (symbol, freq) in HashMap-iteration order.
    Returns {symbol: code_length} (single symbol -> length 0).
    """
    # tree nodes as nested tuples; Suffix = (freq, tree)
    def gt(a, b):  # reversed freq order: smaller freq sorts GREATER
        return a[0] < b[0]

    heap = RustBinaryHeap([(f, ("leaf", s)) for s, f in freq_items], gt)
    assert len(heap) > 0
    while len(heap) > 1:
        lf, lt = heap.pop()
        rf, rt = heap.pop()
        heap.push((lf + rf, ("branch", lt, rt)))
    _, tree = heap.pop()

    lengths = {}
    stack = [(tree, 0)]
    while stack:
        node, depth = stack.pop()
        if node[0] == "leaf":
            lengths[node[1]] = depth
        else:
            stack.append((node[1], depth + 1))
            stack.append((node[2], depth + 1))
    return lengths
