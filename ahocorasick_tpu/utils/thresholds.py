"""Dense/sparse policy interface — reference-API parity shim.

The reference exposes ``Thresholder`` (``threshold/Thresholder.java:3-5``)
to decide when a sparse hashmap trie node should be converted to a dense
range node, with ``RangeNodeThreshold`` (``threshold/RangeNodeThreshold.java``)
as the default cost model.  In this framework every state row is dense over
*compacted alphabet classes*, so the memory/speed trade the policy governed
is already resolved at compile time; the classes are kept (and honored as a
diagnostic predicate) so reference users can port code unchanged.
"""

from __future__ import annotations


class Thresholder:
    """SPI: decide if a node's transitions should be stored densely."""

    def is_over_threshold(self, node_size: int, node_level: int, key_interval_size: int) -> bool:
        raise NotImplementedError


class RangeNodeThreshold(Thresholder):
    """Default cost model (``RangeNodeThreshold.java:7-29``).

    Always dense when the key interval is at most 8; otherwise dense when
    ``size + size/4 + 3 > interval * (max - linear / (constant + level)**exponent)``.
    """

    def __init__(
        self,
        exponent: float = 1.0,
        linear_factor: float = 1.0,
        max_value: float = 0.65,
        constant_factor: float = 2.0,
    ) -> None:
        self.exponent = exponent
        self.linear_factor = linear_factor
        self.max_value = max_value
        self.constant_factor = constant_factor

    def is_over_threshold(self, node_size: int, node_level: int, key_interval_size: int) -> bool:
        if key_interval_size <= 8:
            return True
        fill = self.max_value - self.linear_factor / (
            (self.constant_factor + node_level) ** self.exponent
        )
        return node_size + (node_size // 4) + 3 > key_interval_size * fill
