"""Second, independently-written hashbrown (SwissTable) iteration-order
oracle (VERDICT r3 #8): a structurally different formulation from
colorid_tpu/core/fnv.py so a transcription slip in either cannot hide.

Differences from the production emulation (core/fnv.py::HashbrownOrder):

- no control-byte array and no mirrored 16-byte tail; occupancy is a plain
  dict {bucket: (hash, insertion_index)} and group loads are resolved by a
  mathematical index rule instead of array reads:
      ctrl(idx) for idx in [pos, pos+16):
          idx <  buckets        -> the real bucket idx
          buckets <= idx < 16   -> a PHANTOM slot, permanently empty
                                   (set_ctrl never writes [buckets, 16) --
                                   these bytes stay EMPTY forever)
          idx >= 16             -> the real bucket idx - buckets
                                   (the mirror region: set_ctrl(i) for
                                   i < 16 also writes buckets + i)
- the small-table fallback is derived independently: a candidate found in
  the phantom/mirror region maps through `(pos + j) & mask`; if that real
  bucket is occupied, hashbrown returns the lowest empty byte of the
  ALIGNED group at 0, which (with no deletions and a spare-capacity
  invariant) is simply the lowest-index empty real bucket.

Semantics modeled (same documented sources, different derivation):
h1 = hash & (buckets-1); triangular probing stride += 16; growth to
capacity_to_buckets(items+1) re-inserting live items in ascending-bucket
order; iteration yields occupied buckets ascending.
"""

from __future__ import annotations


def _cap_to_buckets(cap: int) -> int:
    if cap < 4:
        return 4
    if cap < 8:
        return 8
    return 1 << ((cap * 8 // 7) - 1).bit_length()


def _capacity(buckets: int) -> int:
    mask = buckets - 1
    return mask if mask < 8 else buckets // 8 * 7


class SwissOrder:
    def __init__(self) -> None:
        self.buckets = 0
        self.slots: dict[int, tuple[int, int]] = {}  # bucket -> (hash, ins)
        self.growth_left = 0

    def _occupied(self, bucket: int) -> bool:
        return bucket in self.slots

    def _group_slot(self, idx: int) -> int | None:
        """Real bucket behind group byte index `idx`, or None for a
        phantom (permanently empty) slot."""
        if idx < self.buckets:
            return idx
        if idx < 16:
            return None  # phantom: set_ctrl never writes [buckets, 16)
        return idx - self.buckets

    def _find_insert_slot(self, h: int) -> int:
        mask = self.buckets - 1
        pos = h & mask
        stride = 0
        while True:
            for j in range(16):
                real = self._group_slot(pos + j)
                if real is None or not self._occupied(real):
                    result = (pos + j) & mask
                    if self._occupied(result):
                        # wrapped onto a full bucket (buckets < 16):
                        # lowest-index empty real bucket of group 0
                        return next(
                            b for b in range(self.buckets)
                            if not self._occupied(b)
                        )
                    return result
            stride += 16
            pos = (pos + stride) & mask

    def insert(self, h: int, ins: int) -> None:
        if self.growth_left == 0:
            new_buckets = _cap_to_buckets(len(self.slots) + 1)
            old = self.slots
            self.buckets = new_buckets
            self.slots = {}
            for b in sorted(old):  # RawIter: ascending buckets
                oh, oi = old[b]
                self.slots[self._find_insert_slot(oh)] = (oh, oi)
            self.growth_left = _capacity(new_buckets) - len(self.slots)
        self.slots[self._find_insert_slot(h)] = (h, ins)
        self.growth_left -= 1

    def iteration_order(self) -> list[int]:
        return [self.slots[b][1] for b in sorted(self.slots)]


def swiss_iteration_order(hashes) -> list[int]:
    t = SwissOrder()
    for i, h in enumerate(hashes):
        t.insert(int(h), i)
    return t.iteration_order()
