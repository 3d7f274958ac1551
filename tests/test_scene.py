"""Scene import tests (reference semantics: src/twoplusone/softbody/mod.rs:117-189)."""

import numpy as np

from spacetime_tpu import constants, scene
from spacetime_tpu.scene import NEIGHBOR_OFFSETS, RECIPROCAL_SLOT


def test_mask_to_softbody_3x3_full():
    body = scene.mask_to_softbody(np.ones((3, 3), bool), 0, (0.0, 0.0), (0.1, -0.1))
    assert body["pos"].shape == (9, 2)
    # Row-major particle order: center particle is index 4 with all 8 bonds.
    center = body["neighbors"][4]
    assert np.all(center >= 0)
    # left/up/right/down of center = 3, 1, 5, 7; diagonals tl/tr/bl/br = 0, 2, 6, 8
    np.testing.assert_array_equal(center, [3, 1, 5, 7, 0, 2, 6, 8])
    # Corner (0,0) has right, down, br only (slots 2, 3, 7)
    corner = body["neighbors"][0]
    np.testing.assert_array_equal(corner, [-1, -1, 1, 3, -1, -1, -1, 4])
    # Positions: pixel * IMMEDIATE_NEIGHBOR_DIST + offset (mod.rs:149-152)
    np.testing.assert_allclose(
        body["pos"][4], [constants.IMMEDIATE_NEIGHBOR_DIST] * 2, rtol=1e-6
    )
    assert np.all(body["vel"] == np.float32([0.1, -0.1]))


def test_neighbor_wiring_is_symmetric():
    body = scene.mask_to_softbody(scene.disc_mask(7), 0, (0.0, 0.0), (0.0, 0.0))
    nbr = body["neighbors"]
    for i in range(nbr.shape[0]):
        for s in range(8):
            j = nbr[i, s]
            if j >= 0:
                assert nbr[j, RECIPROCAL_SLOT[s]] == i


def test_reciprocal_slot_matches_offsets():
    for s, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
        rdx, rdy = NEIGHBOR_OFFSETS[RECIPROCAL_SLOT[s]]
        assert (rdx, rdy) == (-dx, -dy)


def test_image_to_softbody_nonblack_only():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[1, 1] = (255, 0, 0)
    rgb[2, 2] = (0, 0, 7)
    body = scene.image_to_softbody(rgb, 3, (0.5, 0.5), (0.0, 0.0))
    assert body["pos"].shape == (2, 2)
    assert np.all(body["object_index"] == 3)
    # (1,1) and (2,2) are diagonal neighbors: first particle's br slot = 1
    assert body["neighbors"][0, 7] == 1
    assert body["neighbors"][1, 4] == 0


def test_scene_builder_global_indices_and_ids():
    sb = scene.SceneBuilder()
    sb.add(scene.mask_to_softbody(np.ones((2, 2), bool), 0, (0.0, 0.0), (0.0, 0.0)))
    sb.add(scene.mask_to_softbody(np.ones((2, 2), bool), 1, (1.0, 1.0), (0.0, 0.0)))
    particles, objects = sb.build(capacity=256)
    p = particles
    n_active = int(np.asarray(p.num_active()))
    assert n_active == 8
    nbr = np.asarray(p.neighbors[:8])
    # second body's bonds index into [4, 8)
    assert np.all((nbr[4:] == -1) | (nbr[4:] >= 4))
    ids = np.asarray(p.particle_id[:8])
    assert len(set(ids.tolist())) == 8  # globally unique (mod.rs:157)
    assert int(objects.offset[1]) == 4


def test_radius_for_count():
    r = scene.radius_for_count(10_000)
    count = scene.disc_mask(r).sum()
    assert abs(count - 10_000) / 10_000 < 0.05


def test_two_blob_scene_counts():
    particles, objects = scene.two_blob_collision_scene(radius_px=10, capacity=1024)
    n = int(np.asarray(particles.num_active()))
    assert n == 2 * scene.disc_mask(10).sum()
    obj = np.asarray(particles.object_index)[np.asarray(particles.active)]
    assert set(obj.tolist()) == {0, 1}


def test_lattice_pad_crops_margins_exactly():
    """Round 4: lattice_pad crops the mask to its tight occupancy bbox (dead
    margin slots cost every O(capacity) pass); ACTIVE world positions, bond
    topology and bond vectors must be identical to the uncropped build."""
    mask = np.zeros((12, 10), bool)
    mask[3:7, 2:6] = True  # 4x4 blob with margins on all sides
    body = scene.mask_to_softbody(mask, 0, (0.1, 0.2), (0.0, 0.0),
                                  lattice_pad=True)
    # slots shrink to the 4x4 bbox
    assert body["pos"].shape[0] == 16
    assert body["active"].all()
    # world positions match the naive (uncropped, margin-full) build
    ref = scene.mask_to_softbody(np.asarray(mask), 0, (0.1, 0.2), (0.0, 0.0),
                                 lattice_pad=False)
    got = body["pos"][body["active"]]
    want = ref["pos"]
    np.testing.assert_allclose(
        np.sort(got.ravel()), np.sort(want.ravel()), rtol=1e-6
    )
    # bond structure: every particle's bonded neighbor sits one lattice
    # spacing away, same as the uncropped build
    nbr = body["neighbors"]
    n_bonds = (nbr >= 0).sum()
    assert n_bonds == (ref["neighbors"] >= 0).sum()
