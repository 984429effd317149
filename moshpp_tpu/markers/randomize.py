"""Marker-layout vid randomization for SOMA-style synthesis (reference:
`marker_layout/edit_tools.py:419-527`): jitter each marker's vertex id within
its n-ring mesh neighbourhood."""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

from moshpp_tpu.io.model_loader import load_surface_model


def vertex_adjacency(faces: np.ndarray, num_verts: int):
    """Neighbour lists per vertex from the triangle list (replaces the sparse
    get_vert_connectivity, edit_tools.py:462-479)."""
    nbrs = [set() for _ in range(num_verts)]
    f = np.asarray(faces)
    for i in range(3):
        a, b = f[:, i], f[:, (i + 1) % 3]
        for x, y in zip(a.tolist(), b.tolist()):
            nbrs[x].add(y)
            nbrs[y].add(x)
    return [sorted(s) for s in nbrs]


def find_vertex_neighbours(surface_model_fname: str):
    """Returns get_neighbour(vid, n_ring) -> list of vids
    (edit_tools.py:419-451)."""
    model = load_surface_model(surface_model_fname)
    adj = vertex_adjacency(np.asarray(model.faces), model.v_template.shape[0])

    def get_neighbour(vid: int, n_ring: int = 1):
        if n_ring == 0:
            return [vid]
        frontier = {vid}
        seen = set()
        for _ in range(n_ring):
            nxt = set()
            for v in frontier:
                nxt.update(adj[v])
            seen |= nxt
            frontier = nxt
        return sorted(seen)

    return get_neighbour


def randomize_marker_layout_vids(marker_vids: Dict, marker_type_mask: Dict,
                                 surface_model_fname: str, n_ring: int = 1,
                                 enable_rnd_vid_on_face_hands: bool = True,
                                 seed: Optional[int] = None):
    """Returns get_next() -> new marker_vids dict with per-label jittered vids
    (edit_tools.py:482-527). Handles superset (list-valued) layouts."""
    rng = np.random.default_rng(seed)
    v_neighbors = find_vertex_neighbours(surface_model_fname)

    sample_value = next(iter(marker_vids.values()))
    is_superset = isinstance(sample_value, list)
    body_mask = None
    if not enable_rnd_vid_on_face_hands:
        assert "body" in marker_type_mask, "body mask required to freeze face/hands"
        body_mask = {l: bool(b) for l, b in
                     zip(marker_vids.keys(), marker_type_mask["body"])}

    pool = {}
    for label, vids in marker_vids.items():
        vid_list = vids if is_superset else [vids]
        if body_mask is not None and not body_mask[label]:
            pool[label] = list(vid_list)
            continue
        cands = set(vid_list)
        for v in vid_list:
            cands.update(v_neighbors(int(v), n_ring=n_ring))
        pool[label] = sorted(cands)

    def get_next():
        return OrderedDict((l, int(rng.choice(pool[l]))) for l in marker_vids)

    return get_next
