"""Procedural triangle-mesh fixtures (icosphere family) shared by the
oracle-parity and estimator-deviation tests."""

import numpy as np

from raytracing_course_2024_tpu.scene.types import (
    CameraDesc,
    PrimitiveDesc,
    RenderSettings,
    SceneDesc,
)


def icosphere(subdiv=1):
    """(verts (V,3) unit sphere, faces list of index triples)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    for _ in range(subdiv):
        new_faces = []
        vlist = list(verts)
        cache = {}

        def mid(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                m = vlist[i] + vlist[j]
                m /= np.linalg.norm(m)
                cache[k] = len(vlist)
                vlist.append(m)
            return cache[k]

        for (a, b, c) in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces
        verts = np.asarray(vlist)
    return verts, faces


def displaced_organic_mesh(subdiv=4, amp=0.22):
    """(verts, faces, vnormals): icosphere with smooth radial displacement
    (organic bumps) and per-vertex averaged smooth normals -- a
    practice7_3-class silhouette-rich surface."""
    verts, faces = icosphere(subdiv)
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    r = 1.0 + amp * (
        np.sin(3.1 * x + 1.3) * np.cos(2.3 * y)
        + 0.6 * np.sin(4.7 * z + 0.5) * np.cos(3.9 * x)
    )
    verts = verts * r[:, None]
    vn = np.zeros_like(verts)
    for (a, b, c) in faces:
        fn = np.cross(verts[b] - verts[a], verts[c] - verts[a])
        vn[a] += fn
        vn[b] += fn
        vn[c] += fn
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-30)
    return verts, faces, vn


def mesh_scene_desc(
    verts,
    faces,
    vnormals=None,
    width=48,
    height=32,
    samples=48,
    ray_depth=4,
    color=(0.7, 0.5, 0.6),
    metallic=0.3,
    roughness=0.4,
    bg=(0.15, 0.2, 0.3),
    with_light=True,
):
    prims = []
    for (a, b, c) in faces:
        kw = {}
        if vnormals is not None:
            kw = dict(
                sn0=vnormals[a].copy(), sn1=vnormals[b].copy(),
                sn2=vnormals[c].copy(),
            )
        prims.append(
            PrimitiveDesc(
                ptype=0,
                p0=verts[a].copy(), p1=verts[b].copy(), p2=verts[c].copy(),
                color=np.asarray(color, np.float64),
                metallic=metallic, roughness=roughness, mkind=3, **kw,
            )
        )
    if with_light:
        prims.append(
            PrimitiveDesc(
                ptype=0,
                p0=np.array([-2.0, 2.5, -1.0]),
                p1=np.array([2.0, 2.5, -1.0]),
                p2=np.array([0.0, 2.5, 2.0]),
                color=np.zeros(3),
                emission=np.array([10.0, 9.0, 8.0]),
                mkind=3,
            )
        )
    cam = CameraDesc(
        position=np.array([0.0, 0.4, 3.2]),
        right=np.array([1.0, 0.0, 0.0]),
        up=np.array([0.0, 1.0, 0.0]),
        forward=np.array([0.0, 0.0, -1.0]),
        fov_x=1.0,
        fov_y=2.0 * np.arctan(np.tan(0.5) * height / width),
    )
    settings = RenderSettings(
        width=width, height=height, samples=samples, ray_depth=ray_depth,
        bg_color=tuple(bg), camera=cam,
    )
    return SceneDesc(settings=settings, primitives=prims, planes=[])
