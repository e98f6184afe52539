"""Blender-exporter core: the XML/OBJ it writes must round-trip
through our own parser/loader (and match the reference tag grammar,
ext/plugin/io_nori.py:13-193)."""

import math

import numpy as np
import pytest

from nori_tpu.export import (
    CameraSpec, MeshSpec, SceneExport, write_nori_scene,
)
from nori_tpu.export.blender import camera_spec_from_matrix, mesh_to_world


def _quad(z=0.0):
    pos = np.array(
        [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return pos, faces


def _export_dir(tmp_path):
    pos, faces = _quad()
    lift = np.eye(4)
    lift[1, 3] = 2.0  # translate emitter up
    export = SceneExport(
        camera=CameraSpec(to_world=np.eye(4), fov=40.0, width=32, height=24),
        integrator="path_mis", sample_count=4,
        meshes=[
            MeshSpec(name="floor", positions=pos, faces=faces,
                     normals=np.tile([0.0, 0.0, 1.0], (4, 1)),
                     uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float),
                     bsdf_props={"albedo": np.array([0.5, 0.25, 0.125])}),
            MeshSpec(name="light", positions=pos, faces=faces,
                     to_world=lift,
                     radiance=np.array([10.0, 9.0, 8.0])),
        ],
    )
    xml = str(tmp_path / "scene.xml")
    files = write_nori_scene(export, xml)
    return xml, files


def test_roundtrip_through_parser(tmp_path):
    xml, files = _export_dir(tmp_path)
    assert len(files) == 3  # xml + 2 objs

    from nori_tpu import load_from_xml

    scene = load_from_xml(xml)
    assert len(scene.meshes) == 2
    assert scene.camera.width == 32 and scene.camera.height == 24
    assert math.isclose(scene.camera.fov, 40.0, rel_tol=1e-6)
    assert scene.sampler.sample_count == 4
    assert scene.integrator.plugin_name == "path_mis"

    floor, light = scene.meshes
    assert floor.data.num_faces == 2
    np.testing.assert_allclose(
        np.asarray(floor.bsdf.table_row()["albedo"]),
        [0.5, 0.25, 0.125], rtol=1e-6)
    assert light.is_emitter()
    np.testing.assert_allclose(light.emitter.radiance, [10, 9, 8], rtol=1e-6)
    # the emitter quad was lifted by +2 in y
    np.testing.assert_allclose(
        light.data.positions[:, 1].mean(), 2.0, atol=1e-6)

    sd = scene.compile()
    assert int(sd.n_emissive) == 2


def test_exported_scene_renders(tmp_path):
    xml, _ = _export_dir(tmp_path)
    from nori_tpu import load_from_xml
    from nori_tpu.wavefront import render_wavefront

    scene = load_from_xml(xml)
    img, stats = render_wavefront(scene, spp=2, n_lanes=4096)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()


def test_blender_camera_conversion():
    # a Blender camera at origin looking down -Z (Blender default pose is
    # looking down -Z with +Y up already in world space when matrix is
    # identity); after conversion the Nori camera must look along -Y
    # (Blender's -Z maps to Nori -(-Y)... verify via ray directions)
    spec = camera_spec_from_matrix(
        np.eye(4), math.radians(40.0), 0.1, 100.0, 16, 16)
    m = spec.to_world
    # Nori camera-space forward is +Z; world forward = R @ [0,0,1]
    fwd = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
    # Blender identity camera looks along -Z (world); -Z_blender -> +Y...
    # _BLENDER_TO_NORI maps (x,y,z) -> (x, z, -y): -Z_b -> (0,-1,0)
    np.testing.assert_allclose(fwd, [0.0, -1.0, 0.0], atol=1e-12)
    # up stays +Y_nori (Blender camera up +Y_b -> (0,0,1)? check det/right-
    # handedness preserved after flip: det must be +1 for a valid rotation
    # times flip parity; Nori accepts any affine, just sanity-check finite
    assert np.isfinite(m).all()
    # a mesh matrix converts without the camera flip
    mm = mesh_to_world(np.eye(4))
    np.testing.assert_allclose(mm, np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        float))


def test_name_sanitization_and_dedup(tmp_path):
    pos, faces = _quad()
    export = SceneExport(
        camera=CameraSpec(to_world=np.eye(4), width=8, height=8),
        meshes=[
            MeshSpec(name="a b/c", positions=pos, faces=faces),
            MeshSpec(name="a b\\c", positions=pos, faces=faces),
        ],
    )
    xml = str(tmp_path / "scene.xml")
    files = write_nori_scene(export, xml)
    names = [f.split("/")[-1] for f in files[1:]]
    assert len(set(names)) == 2
    for n in names:
        assert "/" not in n and " " not in n
