"""Engine constants mirroring the reference's tree parameters.

Reference cites:
- MAX_DEPTH=5, MAX_CAPACITY=4: DynamicOctree.hpp:51-52
- 2D static quadtree MAX_DEPTH=5 (max node depth 4): .Test/QuadTree.cpp:79,131-148
- coarse world-partition cell size 255 (y unbounded): WorldPartition.hpp:240
- demo world 800 x 50 x 600: main.cpp:16-19
- quadtree bench world 100000^2: .Test/QuadTree.cpp:331
"""

from __future__ import annotations

from dataclasses import dataclass

# Octree (3D, capacity-gated, depth counts DOWN from root=MAX_DEPTH)
OCTREE_MAX_DEPTH = 5
OCTREE_CAPACITY = 4

# Static quadtree (2D, no capacity, depth counts UP from root=0;
# a child at depth d is entered only while d < QT_MAX_DEPTH, so the
# deepest node sits at depth QT_MAX_DEPTH - 1 = 4).
QT_MAX_DEPTH = 5

# Coarse world-partition grid (reference cell edge; y is unbounded there)
COARSE_CELL = 255.0

# Engine-native power-of-two world used for the integer Morton fast path.
# 2^16 per axis => 16-bit coordinates, 32-bit 2D Morton, 48-bit 3D Morton.
POW2_WORLD_BITS = 16
POW2_WORLD_EDGE = 1 << POW2_WORLD_BITS  # 65536


@dataclass(frozen=True)
class Box3:
    """World extent for recursive-halving cell math (float64 end to end)."""

    min_x: float
    min_y: float
    min_z: float
    max_x: float
    max_y: float
    max_z: float


@dataclass(frozen=True)
class Box2:
    min_x: float
    min_y: float
    max_x: float
    max_y: float


# Reference demo world (main.cpp:16-19) and quadtree bench world
DEMO_WORLD = Box3(0.0, 0.0, 0.0, 800.0, 50.0, 600.0)
QT_BENCH_WORLD = Box2(0.0, 0.0, 100_000.0, 100_000.0)
POW2_WORLD_2D = Box2(0.0, 0.0, float(POW2_WORLD_EDGE), float(POW2_WORLD_EDGE))
