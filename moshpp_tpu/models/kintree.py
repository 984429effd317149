"""Canonical kinematic-tree parent tables for the SMPL model families.

These are the standard public SMPL/SMPL+H/SMPL-X/MANO topologies; real model
files carry the same table in `kintree_table` and the loader prefers the
on-disk values (`io/model_loader.py`). Synthetic test models reuse these so
fullpose layouts match the real families.
"""

SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)

# body (22) + 15 joints per hand (index, middle, pinky, ring, thumb x 3)
SMPLH_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
    21, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50,
)

# body (22) + jaw, leye, reye + 15 joints per hand
SMPLX_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
)

MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# SMAL-family animals: simple chain trees with leg branches; synthetic only —
# real SMAL files carry their own kintree_table.
ANIMAL_HORSE_PARENTS = tuple([-1] + [i // 1 for i in range(35)])  # placeholder chain
ANIMAL_DOG_PARENTS = tuple([-1] + [i // 1 for i in range(34)])

DEFAULT_PARENTS = {
    "smpl": SMPL_PARENTS,
    "smplh": SMPLH_PARENTS,
    "smplx": SMPLX_PARENTS,
    "mano": MANO_PARENTS,
    "animal_horse": ANIMAL_HORSE_PARENTS,
    "animal_dog": ANIMAL_DOG_PARENTS,
}
