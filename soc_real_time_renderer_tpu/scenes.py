"""Scene presets — the Application-constructor analog.

The reference hardcodes its scene at startup
(``/root/reference/src/application.cpp:14-28``): a Sponza entity at
scale 0.01 plus a DamagedHelmet entity at identity.  These presets
rebuild the same entity setups (plus the BASELINE.json benchmark
variants) and package everything the jitted frame needs.

NOTE: the mounted reference assets are missing ``Sponza.bin`` /
``old_sponza.bin`` (geometry) — only the Sponza *textures* exist.  The
``sponza`` preset therefore uses a procedurally generated atrium of
comparable scale (~260k triangles, columns/arches/floors) textured with
the real Sponza materials; see BASELINE.md.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from . import config as cfg_mod
from .camera import Camera3D, camera_matrices
from .config import RenderConfig, ShaderGlobals, SunInfo
from .graph import frame as frame_mod
from .models import gltf, proc
from .models.scene_batch import SceneBatch, build_scene_batch
from .scene.components import MeshComponent, TransformComponent
from .scene.scene import Scene

ASSETS = os.environ.get("SOC_ASSETS", "/root/reference/assets")


@dataclass
class BuiltScene:
    scene: Scene
    batch: SceneBatch
    plan: frame_mod.FramePlan
    camera: Camera3D
    camera_position: np.ndarray
    camera_target: np.ndarray
    animate: bool = False
    sun: SunInfo | None = None   # live-edited sun (viewer); None = default

    def apply_input(self, inp, dt: float) -> None:
        """Interactive fly-camera input (ControlledCamera3D), used by
        the web viewer; disables the preset animation."""
        from .camera import ControlledCamera3D
        if not hasattr(self, "_fly"):
            self._fly = ControlledCamera3D(camera=self.camera)
            self._fly.position = np.asarray(self.camera_position,
                                            np.float32).copy()
            rel = self.camera_target - self.camera_position
            self._fly.rotation = np.array(
                [np.arctan2(rel[2], rel[0]),
                 -np.arcsin(rel[1] / max(np.linalg.norm(rel), 1e-6)), 0.0],
                np.float32)
            self.animate = False
        self._fly.update(inp, dt)

    def set_sun(self, position=None, angle_direction_deg=None) -> None:
        """Live sun edit (the reference's sun-position ImGui control,
        renderer.cpp:683-767): rebuilds the sun matrices AND re-proves
        the shadow-elision plan against them — a moved sun can put
        geometry inside the volume, and the stale proof would otherwise
        be rejected at dispatch (check_sun_proof).  Follow with
        rebuild() or rely on the caller's rebuild flag."""
        kw = {}
        if position is not None:
            kw["position"] = tuple(float(v) for v in position)
        if angle_direction_deg is not None:
            kw["angle_direction_deg"] = tuple(
                float(v) for v in angle_direction_deg)
        self.sun = SunInfo.create(**kw)

    def mesh_signature(self):
        """Identity of the renderable mesh set — changes exactly when a
        batch rebuild is needed (entity with a loaded mesh added or
        removed, or a model swapped)."""
        return tuple((e.eid, id(e.get_component(MeshComponent).model))
                     for e in self.scene.mesh_entities())

    # FramePlan fields a session may have customized after build; a
    # rebuild must not silently revert them (trilinear A/B, sharding,
    # interpret mode, fallback caps)
    _PLAN_OVERRIDES = ("texture_filter", "texture_impl", "interpret",
                       "shard_mesh", "shard_axis", "tex_dirty_cap",
                       "tex_px_fallback", "tex_px_cap", "rec_pack")

    def rebuild(self) -> None:
        """Re-derive the render state from the LIVE scene (the analog
        of the reference loading a model into a new entity and drawing
        it next frame).  Keeps camera/fly state and the plan overrides
        in _PLAN_OVERRIDES; the caller re-jits with
        make_render_fn(self.plan) (memoized + persistent compile cache,
        so an unchanged plan costs nothing).

        Two tiers, decided by whether the renderable model set changed:
        * same models — cheap: re-bound the light scan to the live
          light counts and RE-PROVE the shadow elision against the live
          transforms (a transform edit can move geometry into the sun
          volume; the build-time proof must not outlive it);
        * changed models — full _finish re-pack (batch + atlas + plan).
        No-op when the scene has no renderable meshes (an empty batch
        has no triangle stream)."""
        import dataclasses as _dc
        models = [e.get_component(MeshComponent).model
                  for e in self.scene.mesh_entities()]
        if not models:
            return
        old = self.plan
        # strong refs + elementwise `is`: id() comparison against a
        # persisted list is unsound (CPython reuses addresses after GC)
        prev = getattr(self, "_models", None)
        same = (prev is not None and len(prev) == len(models)
                and all(a is b for a, b in zip(prev, models)))
        if same:
            lights = self.scene.update(0.0)
            cfg2 = old.config.replace(
                max_point_lights=int(lights.point_count),
                max_spot_lights=int(lights.spot_count))
            mm, _ = self.scene.transform_matrices()
            # the cheap path never changes the batch, so its host-side
            # proof inputs are pulled once and reused across edits
            # (a per-edit device->host readback of every triangle
            # stalls the viewer's render loop)
            if getattr(self, "_proof_pos", None) is None:
                self._proof_pos = np.asarray(self.batch.tri_pos)
                self._proof_ent = np.asarray(self.batch.tri_entity)
            empty, proved, crop = _prove_shadow(
                self.batch, mm, pos=self._proof_pos,
                ent=self._proof_ent, sun=self.sun,
                shadow_resolution=cfg2.shadow_resolution)
            self.plan = _dc.replace(
                old, config=cfg2, shadow_statically_empty=empty,
                proved_sun_pv=proved, shadow_crop=crop,
                proved_crop_mats=(tuple(float(v)
                                        for v in np.asarray(mm).ravel())
                                  if crop is not None else None))
        else:
            nb = _finish(self.scene, models, old.config,
                         camera_pos=self.camera_position,
                         camera_target=self.camera_target,
                         animate=self.animate,
                         atlas_size=old.atlas_size,
                         build_page=(True if old.texture_impl == "pallas"
                                     else None),
                         sun=self.sun)
            self.batch = nb.batch
            self._proof_pos = self._proof_ent = None
            self.plan = _dc.replace(
                nb.plan, **{f: getattr(old, f)
                            for f in self._PLAN_OVERRIDES})
        self._models = list(models)

    def resize(self, width: int, height: int) -> None:
        """The reference's resize path (SURVEY §3.5): swapchain resize +
        recreate_framebuffer (renderer.cpp:815-881) + camera.resize
        (application.cpp:96-100).  Recreates the resolution-dependent
        state in place — config, main bin grid (re-capped for the live
        scene), camera aspect/projection — and restarts the prev-camera
        roll (the first post-resize frame has no same-shape history to
        reproject, matching the recreated targets).  The scene batch,
        atlas, shadow grid/proof and plan overrides are untouched: like
        the reference, the task graph itself is NOT rebuilt — half-res
        targets are derived from config inside render_frame (the
        persistent-TaskImage set_images analog).

        The caller re-jits with make_render_fn(self.plan) and recreates
        RenderHistory (the destroy+recreate of all render targets)."""
        import dataclasses as _dc
        from .ops import raster2
        width, height = int(width), int(height)
        if width % 32 or height % 32 or width < 64 or height < 64:
            # Pallas tile alignment: SSAO/TAA/texsample windows assume
            # even half-res dims and 16px tiles; shipped configs are
            # all multiples of 32 (640x384 .. 1920x1088)
            raise ValueError(
                f"resize: width/height must be multiples of 32 and "
                f">= 64, got {width}x{height}")
        cfg2 = self.plan.config.replace(width=width, height=height)
        main = _cap_grid(raster2.default_grid(width, height),
                         int(self.batch.num_triangles))
        self.plan = _dc.replace(self.plan, config=cfg2, main_grid=main)
        self.camera.resize(width, height)
        if hasattr(self, "_prev_cam"):
            del self._prev_cam

    def frame_globals(self, frame_index: int, dt: float = 1.0 / 60.0,
                      peek: bool = False):
        """Per-frame host update: camera/jitter/lights/transforms —
        Application::update + Scene::update analog.

        peek=True reads the current globals WITHOUT advancing the
        prev-camera roll — for observers (the viewer's /schema handler)
        that must not corrupt the render loop's TAA reprojection
        velocity."""
        from .utils import mathutil as mu
        if hasattr(self, "_fly"):
            cam = camera_matrices(self.camera, self._fly.position,
                                  frame_index, self.plan.config.width,
                                  self.plan.config.height)
            cam_prev = getattr(self, "_prev_cam", cam)
            if not peek:
                self._prev_cam = cam
            lights = self.scene.update(dt)
            g = ShaderGlobals.create(
                camera=cam, camera_prev=cam_prev, lights=lights,
                sun=self.sun,
                near_clip=self.camera.near_clip,
                far_clip=self.camera.far_clip,
                elapsed_time=np.float32(frame_index * dt),
                delta_time=np.float32(dt),
                frame_counter=np.int32(frame_index))
            mm, nm = self.scene.transform_matrices()
            return g, mm, nm
        pos = self.camera_position
        if self.animate:
            ang = 0.25 * frame_index * dt
            c, s = np.cos(ang), np.sin(ang)
            rel = self.camera_position - self.camera_target
            pos = self.camera_target + np.array(
                [c * rel[0] - s * rel[2], rel[1], s * rel[0] + c * rel[2]],
                np.float32)
        self.camera.view_mat = mu.look_at(pos, self.camera_target,
                                          np.array([0., 1., 0.], np.float32))
        cam = camera_matrices(self.camera, pos, frame_index,
                              self.plan.config.width,
                              self.plan.config.height)
        cam_prev = getattr(self, "_prev_cam", cam)
        if not peek:
            self._prev_cam = cam
        lights = self.scene.update(dt)
        g = ShaderGlobals.create(
            camera=cam, camera_prev=cam_prev, lights=lights, sun=self.sun,
            near_clip=self.camera.near_clip, far_clip=self.camera.far_clip,
            elapsed_time=np.float32(frame_index * dt),
            delta_time=np.float32(dt),
            frame_counter=np.int32(frame_index))
        mm, nm = self.scene.transform_matrices()
        return g, mm, nm


def _prove_shadow(batch, model_mats, pos=None, ent=None, sun=None,
                  shadow_resolution: int | None = None):
    """(statically_empty, proved_sun_pv-or-None, shadow_crop-or-None)
    for the GIVEN transforms and sun (None = the build-time default).
    proved_sun_pv records WHICH sun the proof holds for; make_render_fn
    rejects frames whose g.sun differs (ADVICE round 2).

    shadow_crop (only when NOT empty and shadow_resolution given): the
    static texel window (x0, y0, w, h) that provably contains every
    non-1.0 shadow-map texel — the xy sun-NDC bbox of all vertices
    (rasterized footprints are inside their triangles' vertex bboxes)
    plus margin, 128-aligned.  composition samples the ESM factor from
    this crop instead of the full map: every texel outside it is
    exactly the 1.0 clear, so the (usually huge, latency-plateau) 4096²
    gather table shrinks to the geometry's actual footprint with
    bit-identical output (VERDICT r3 item 3 — the ESM gather is ~20 ms
    of config 6's shadow cost).

    pos/ent: optional pre-pulled host copies of batch.tri_pos /
    batch.tri_entity (BuiltScene.rebuild's cheap path caches them to
    avoid a per-edit device readback)."""
    sun = sun if sun is not None else cfg_mod.SunInfo.create()
    sun_pv = np.asarray(sun.projection_view, np.float32)
    empty, ndc = _shadow_statically_empty(batch, np.asarray(model_mats),
                                          pos=pos, ent=ent, sun_pv=sun_pv)
    empty = bool(empty)
    proved = None
    crop = None
    if empty:
        proved = tuple(float(v) for v in sun_pv.ravel())
    elif ndc is not None and shadow_resolution:
        x, y = ndc
        S = int(shadow_resolution)
        u0 = float(np.min(x)) * 0.5 + 0.5
        u1 = float(np.max(x)) * 0.5 + 0.5
        v0 = float(np.min(y)) * 0.5 + 0.5
        v1 = float(np.max(y)) * 0.5 + 0.5
        # 4-texel margin (raster rounding + bilinear footprint), then
        # 128-align so the crop slice keeps a lane-friendly layout
        x0 = max(0, (int(np.floor(u0 * S)) - 4) // 128 * 128)
        y0 = max(0, (int(np.floor(v0 * S)) - 4) // 128 * 128)
        x1 = min(S, -(-(int(np.ceil(u1 * S)) + 4) // 128) * 128)
        y1 = min(S, -(-(int(np.ceil(v1 * S)) + 4) // 128) * 128)
        if x1 > x0 and y1 > y0 and (x1 - x0) * (y1 - y0) < 0.7 * S * S:
            crop = (x0, y0, x1 - x0, y1 - y0)
    return empty, proved, crop


def _shadow_statically_empty(batch, model_mats, margin: float = 1e-4,
                             pos=None, ent=None, sun_pv=None):
    """(all_excluded, (x, y) sun-NDC vertex coords or None).

    all_excluded is True iff every triangle is provably outside the sun
    clip volume on one common side (z or x or y), for the GIVEN sun
    matrices (None = config.SunInfo.create defaults = renderer.cpp:
    108-133).  Conservative: any vertex in/straddling -> False.  The
    (x, y) NDC arrays feed _prove_shadow's crop bbox; None when any
    w <= eps (non-ortho corner case — no proof, no crop)."""
    from .config import SunInfo
    if pos is None:
        pos = np.asarray(batch.tri_pos)             # (3 verts, 3 xyz, T)
    if ent is None:
        ent = np.asarray(batch.tri_entity)          # (T,)
    M = model_mats[ent]                             # (T, 4, 4)
    pv = (np.asarray(SunInfo.create().projection_view)
          if sun_pv is None else np.asarray(sun_pv))
    zs, xs, ys = [], [], []
    for v in range(3):
        p = pos[v]                                  # (3, T)
        wx = M[:, 0, 0] * p[0] + M[:, 0, 1] * p[1] + M[:, 0, 2] * p[2] + M[:, 0, 3]
        wy = M[:, 1, 0] * p[0] + M[:, 1, 1] * p[1] + M[:, 1, 2] * p[2] + M[:, 1, 3]
        wz = M[:, 2, 0] * p[0] + M[:, 2, 1] * p[1] + M[:, 2, 2] * p[2] + M[:, 2, 3]
        cx = pv[0, 0] * wx + pv[0, 1] * wy + pv[0, 2] * wz + pv[0, 3]
        cy = pv[1, 0] * wx + pv[1, 1] * wy + pv[1, 2] * wz + pv[1, 3]
        cz = pv[2, 0] * wx + pv[2, 1] * wy + pv[2, 2] * wz + pv[2, 3]
        cw = pv[3, 0] * wx + pv[3, 1] * wy + pv[3, 2] * wz + pv[3, 3]
        if not np.all(cw > 1e-6):
            return False, None
        zs.append(cz / cw)
        xs.append(cx / cw)
        ys.append(cy / cw)
    z = np.stack(zs)                    # (3 verts, T)
    x = np.stack(xs)
    y = np.stack(ys)
    m = margin
    # Per-TRIANGLE plane separation (sound frustum cull): a triangle is
    # provably outside iff all 3 vertices fall beyond one common clip
    # plane.  The whole map is empty iff every triangle is excluded —
    # this handles mixed scenes (e.g. terrain peaks inside the sun's
    # z-range but outside its xy window, and vice versa).
    excluded = ((z > 1.0 + m).all(0) | (z < 0.0 - m).all(0)
                | (x > 1.0 + m).all(0) | (x < -1.0 - m).all(0)
                | (y > 1.0 + m).all(0) | (y < -1.0 - m).all(0))
    return bool(np.all(excluded)), (x, y)


def _cap_grid(grid, T: int):
    """Scene-sized pair caps for a bin grid: the sorted pair stream
    truncates (bottom-of-screen bins drop) if the cap is exceeded.
    With 64px bins + exact near-clip bboxes the medium path (bbox > 4
    bins ~ >128px) is rare (tens of triangles at Sponza scale); pairs
    average well under 2 bins/triangle."""
    import dataclasses as _dc
    # med_cap x med_slots rides the sort as dead keys whether medium
    # triangles exist or not: measured medium counts are 55 (sponza) /
    # 249 (full) at the bench cameras (round-4 CPU sweep) — 4096 keeps
    # >16x margin for close-up views; OVERFLOW_MED_CAP surfaces misses.
    med_cap = max(2048, min(T // 32, 4096))
    # pair_cap sizes the sorted-record GATHER (a fixed cap-index cost
    # per frame whether pairs exist or not): measured pair counts are
    # ~0.55*T across the animated cameras (sponza 99k of T=168k, full
    # 185k of T=345k — round-4 CPU sweep).  Cap 2*T keeps ~3.6x margin
    # for unmeasured close-up/free-fly views (ADVICE r4: the hardware
    # raster never drops fragments, so OVERFLOW_PAIRS must stay a
    # should-never-fire guard, not a budget); the bf16 pair records
    # (raster2.build_records) make the cap-indexed gather cheap enough
    # that the margin costs ~nothing.
    want = min(4 * T + med_cap * grid.med_slots, max(2 * T, 262144))
    want = -(-want // grid.chunk) * grid.chunk
    return _dc.replace(grid, pair_cap=want, med_cap=med_cap)


def _finish(scene, models, config, camera_pos, camera_target, animate=False,
            atlas_size=1024, build_page=None, sun=None):
    # bound the composition light scans by the actual scene lights
    lights = scene.update(0.0)
    config = config.replace(
        max_point_lights=int(lights.point_count),
        max_spot_lights=int(lights.spot_count))
    batch, atlas = build_scene_batch(models, atlas_size=atlas_size,
                                     build_page=build_page)
    # the reference's tiled cloud-noise texture (cloud_rendering.inl:
    # 219-233); sampled in VMEM by the Pallas sky kernel.  Missing
    # asset -> procedural-noise LUT fallback (frame.py).
    noise_path = os.path.join(ASSETS, "Clouds/noise.png")
    if config.enable_clouds and os.path.exists(noise_path):
        from .models.texture import decode_image
        img = decode_image(open(noise_path, "rb").read())
        import dataclasses as _dc0
        batch = _dc0.replace(
            batch, cloud_noise=(img[..., 0].astype(np.float32) / 255.0))
    plan = frame_mod.FramePlan.create(config, atlas)
    import dataclasses as _dc
    T = batch.num_triangles
    plan = _dc.replace(plan, main_grid=_cap_grid(plan.main_grid, T),
                       shadow_grid=_cap_grid(plan.shadow_grid, T))
    # Statically-empty shadow proof (FramePlan.shadow_statically_empty
    # docstring has the full reference-bug chain): if EVERY world-space
    # vertex lands strictly outside the sun clip volume on the SAME
    # side, no fragment can survive the shadow raster's clip, so the
    # map provably stays at its 1.0 clear and the pass is elided.
    mm_np, _ = scene.transform_matrices()
    empty, proved, crop = _prove_shadow(
        batch, np.asarray(mm_np), sun=sun,
        shadow_resolution=config.shadow_resolution)
    plan = _dc.replace(
        plan, shadow_statically_empty=empty, proved_sun_pv=proved,
        shadow_crop=crop,
        # the crop is only sound for these transforms — record them so
        # render_frame can reject a stale crop (ADVICE r4)
        proved_crop_mats=(tuple(float(v)
                                for v in np.asarray(mm_np).ravel())
                          if crop is not None else None))
    # Size the dirty-tile fallback cap from the screen tile count.
    # Round 4 measured 11.8-15% dirty and sized the cap at 15% of NT —
    # but that rate was an artifact: the bf16 pair-record residual
    # rows were folded to zero on TPU (PERF.md pathology 6), so 3-5%
    # of tri_ids flipped and fed scattered uv/lod to the planner.
    # With the exact bf16 stream (round 5), chip-measured dirty rates
    # are 21..25 of 3680 tiles at 1280x736 and 15..46 of 8160 at
    # 1920x1088 (out/r5/bl123.log, bl45.log) — <0.7%.  Cap at 5% of
    # NT (7x the worst measured rate), 128-aligned, floor 256; the
    # tile-mode fallback tax is proportional to the CAP (cap*256 px
    # re-gathered every frame), so right-sizing it is a direct win.
    # Over-cap still fires OVERFLOW_TEX_DIRTY loudly, and
    # FramePlan.tex_px_fallback degrades per-pixel instead.
    nt = (config.height // 16) * (config.width // 16)
    cap = max(256, -(-int(0.05 * nt) // 128) * 128)
    plan = _dc.replace(plan, tex_dirty_cap=cap)
    if config.enable_ssr:
        # SSR march compaction (ops/ssr.py): the march runs on
        # (cap,)-shaped arrays, so its cost is CAP-proportional.
        # Chip-measured reflective coverage (out/r5/bl67.log, config
        # 7): ssr_active 17884..18181 of 940k px (~1.9%) — sponza's
        # materials are almost entirely dielectric.  Cap at 5% of the
        # screen (2.6x the measured max); OVERFLOW_SSR_CAP +
        # FrameOutputs.ssr_active guard/size it from data like
        # tex_dirty_cap.
        scap = -(-int(0.05 * config.width * config.height) // 1024) * 1024
        plan = _dc.replace(plan, ssr_cap=scap)
    # one-time HBM residency for geometry + atlas (SURVEY §2.6 P4: the
    # staging-upload analog; per-frame re-upload of the packed atlas
    # costs seconds)
    import jax as _jax
    batch = _jax.device_put(batch)
    cam = Camera3D()
    cam.resize(config.width, config.height)
    bs = BuiltScene(scene=scene, batch=batch, plan=plan, camera=cam,
                    camera_position=np.asarray(camera_pos, np.float32),
                    camera_target=np.asarray(camera_target, np.float32),
                    animate=animate, sun=sun)
    bs._models = list(models)        # rebuild() cheap-path key (strong refs)
    return bs


_DEFAULT_MODEL = None


def default_model():
    """DamagedHelmet ModelData, lazily loaded once — what the viewer's
    add-MeshComponent menu assigns so a created entity is immediately
    renderable (application.cpp:22-28 model)."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        _DEFAULT_MODEL = gltf.load_model(
            os.path.join(ASSETS, "DamagedHelmet/glTF/DamagedHelmet.gltf"))
    return _DEFAULT_MODEL


def build_helmet(config: RenderConfig, **kw) -> BuiltScene:
    """BASELINE config 1/2: DamagedHelmet (application.cpp:22-28)."""
    scene = Scene("helmet")
    e = scene.create_entity("damaged helmet model")
    e.add_component(TransformComponent())
    mc = e.add_component(MeshComponent())
    mc.model = gltf.load_model(
        os.path.join(ASSETS, "DamagedHelmet/glTF/DamagedHelmet.gltf"))
    return _finish(scene, [mc.model], config,
                   camera_pos=[0.0, 0.0, 2.5], camera_target=[0, 0, 0],
                   **kw)


def build_helmet_lifted(config: RenderConfig, **kw) -> BuiltScene:
    """Benchmark appendix variant (VERDICT r2 item 7): the helmet
    lifted to y=32, INSIDE the sun's ortho volume (y 24..56 around the
    y=40 light, renderer.cpp:110-112), so the 4096² shadow raster is
    NOT statically elidable and its cost is actually paid."""
    scene = Scene("helmet_lifted")
    e = scene.create_entity("damaged helmet model")
    tc = e.add_component(TransformComponent())
    tc.set_position([0.0, 32.0, 0.0])
    mc = e.add_component(MeshComponent())
    mc.model = gltf.load_model(
        os.path.join(ASSETS, "DamagedHelmet/glTF/DamagedHelmet.gltf"))
    built = _finish(scene, [mc.model], config,
                    camera_pos=[0.0, 32.0, 2.5],
                    camera_target=[0, 32, 0], **kw)
    assert not built.plan.shadow_statically_empty, \
        "lifted helmet must defeat the elision proof"
    return built


def build_sponza(config: RenderConfig, **kw) -> BuiltScene:
    """BASELINE config 3/5 stand-in: procedural atrium with Sponza
    textures + the DamagedHelmet, matching application.cpp:14-28's
    two-entity layout (sponza scale 0.01 + helmet)."""
    scene = Scene("sponza")
    e = scene.create_entity("sponza model")
    tc = e.add_component(TransformComponent())
    tc.set_scale([0.01, 0.01, 0.01])
    mc = e.add_component(MeshComponent())
    mc.model = proc.build_atrium(
        texture_dir=os.path.join(ASSETS, "Sponza/glTF"))

    e2 = scene.create_entity("damaged helmet model")
    e2.add_component(TransformComponent())
    mc2 = e2.add_component(MeshComponent())
    mc2.model = gltf.load_model(
        os.path.join(ASSETS, "DamagedHelmet/glTF/DamagedHelmet.gltf"))
    return _finish(scene, [mc.model, mc2.model], config,
                   camera_pos=[-7.0, 1.8, 0.0], camera_target=[0, 1.5, 0],
                   **kw)


def _terrain_model(**build_kw):
    """build_kw: build_terrain_model overrides (height_scale, midpoint,
    scale, ...) — the viewer's live terrain edits re-bake through here
    (models/terrain.py module docstring: parameters-to-geometry is a
    host-side rebuild where the reference re-tessellates per frame)."""
    from .models import terrain as terrain_mod
    hm_path = os.environ.get("SOC_TERRAIN_HEIGHTMAP")
    hm = terrain_mod.load_heightmap(hm_path, n=512)
    alb_path = os.environ.get("SOC_TERRAIN_ALBEDO")
    if alb_path:
        if alb_path.endswith(".exr"):
            from .utils import exr
            alb = exr.read_exr_rgba(alb_path)
        else:
            from .models.texture import decode_image
            alb = decode_image(open(alb_path, "rb").read()).astype(
                np.float32) / 255.0
    else:
        alb = terrain_mod.default_albedo(hm)
    return terrain_mod.build_terrain_model(hm, alb, **build_kw)


def build_terrain(config: RenderConfig, **kw) -> BuiltScene:
    """BASELINE config 4: terrain + shadow + atmosphere sky."""
    scene = Scene("terrain")
    e = scene.create_entity("terrain")
    e.add_component(TransformComponent())
    mc = e.add_component(MeshComponent())
    mc.model = _terrain_model()
    return _finish(scene, [mc.model], config,
                   camera_pos=[20.0, 12.0, 20.0], camera_target=[50, 0, 50],
                   **kw)


def build_full(config: RenderConfig, **kw) -> BuiltScene:
    """BASELINE config 5: atrium + helmet + terrain, animated camera."""
    scene = Scene("full")
    e = scene.create_entity("sponza model")
    tc = e.add_component(TransformComponent())
    tc.set_scale([0.01, 0.01, 0.01])
    mc = e.add_component(MeshComponent())
    mc.model = proc.build_atrium(
        texture_dir=os.path.join(ASSETS, "Sponza/glTF"))
    e2 = scene.create_entity("damaged helmet model")
    e2.add_component(TransformComponent())
    mc2 = e2.add_component(MeshComponent())
    mc2.model = gltf.load_model(
        os.path.join(ASSETS, "DamagedHelmet/glTF/DamagedHelmet.gltf"))
    e3 = scene.create_entity("terrain")
    tc3 = e3.add_component(TransformComponent())
    tc3.set_position([0.0, -8.0, 0.0])
    mc3 = e3.add_component(MeshComponent())
    mc3.model = _terrain_model()
    return _finish(scene, [mc.model, mc2.model, mc3.model], config,
                   camera_pos=[-7.0, 1.8, 0.0], camera_target=[0, 1.5, 0],
                   animate=True, **kw)


def build(name: str, config: RenderConfig, **kw) -> BuiltScene:
    """kw passes through to _finish (e.g. build_page=True to force the
    tile-sampler atlas page on a single-material scene whose plan will
    override texture_impl="pallas")."""
    if name == "helmet":
        return build_helmet(config, **kw)
    if name == "helmet_lifted":
        return build_helmet_lifted(config, **kw)
    if name == "sponza":
        return build_sponza(config, **kw)
    if name == "terrain":
        return build_terrain(config, **kw)
    if name == "full":
        return build_full(config, **kw)
    raise ValueError(name)
