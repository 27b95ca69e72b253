"""Image-sequence pipeline: Drunkard / RealColon / Syncolon two-view mapping.

End-to-end parity with the real-image path of the reference
(``Execution/drunkard.cc:80-101`` + ``SLAM::processImage`` +
``Mapping::doMapping`` / ``monocularMapInitialization``,
``Modules/Mapping/Mapping.cc:74-278``):

frame loop -> grayscale conversion (green channel for 4-channel endoscopy
frames, ``SLAM.cc:150-170``) -> masked FAST+ORB extraction -> windowed
Hamming matching against the reference frame -> (optional) epipolar inlier
filter with E from the known poses -> dual-point triangulation with
depth-limit/reprojection/parallax gates -> per-keyframe depth-scale estimate
-> deformation-regularized refinement -> metric journal. The loop stops at
the first successfully triangulated pair, like the reference mains.

Depth semantics parity: measured depth = bilinear(depth image)(x, y) / 100
(``Frame.cc:103-117`` divides by 100 unconditionally). The reference's
16-bit Drunkard PNGs are converted to float first (see datasets.loaders).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import deformable, outer
from ..ops import camera as cam_ops
from ..ops import epipolar as epi_ops
from ..ops import features as feat_ops
from ..ops import lie
from ..ops import matching as match_ops
from ..ops import triangulation as tri
from ..utils import metrics as metrics_mod
from ..utils.journal import ExperimentJournal
from ..viz import FrameVisualizer, MapVisualizer
from ..precision import FP


def to_grayscale(im: np.ndarray) -> np.ndarray:
    """``SLAM::convertImageToGrayScale``: 3ch -> RGB2GRAY weights on the
    BGR-loaded buffer (reference quirk kept), 4ch -> green channel."""
    if im.ndim == 2:
        return im.astype(np.float32)
    if im.shape[2] == 4:
        return im[:, :, 1].astype(np.float32)
    b, g, r = im[:, :, 0], im[:, :, 1], im[:, :, 2]
    # cv::COLOR_RGB2GRAY applied to a BGR buffer weights blue as red.
    return (0.299 * b + 0.587 * g + 0.114 * r).astype(np.float32)


@dataclasses.dataclass
class PairInitResult:
    accepted: bool
    reason: str = ""
    n_matches: int = 0
    n_triangulated: int = 0
    parallax_deg: float = 0.0
    # arrays over the match list (compact):
    kp1: np.ndarray = None
    kp2: np.ndarray = None
    p1: np.ndarray = None
    p2: np.ndarray = None
    valid: np.ndarray = None
    octave1: np.ndarray = None
    octave2: np.ndarray = None
    d1: np.ndarray = None
    d2: np.ndarray = None
    s1: float = 1.0
    s2: float = 1.0
    # Pose-unknown mode: the RANSAC-recovered world-to-camera poses (None when
    # the loader's ground-truth poses were used).
    T1w_est: tuple = None
    T2w_est: tuple = None
    # Depth-scale prior (s1_0, info1, s2_0, info2) from the estimate's SE.
    scale_priors: tuple = None


class SequencePipeline:
    def __init__(
        self,
        cfg: Config,
        border_mask: Optional[np.ndarray] = None,
        viz_dir: str = "./viz",
    ):
        self.cfg = cfg
        self.cam_kind = cam_ops.KB8
        self.cam_params = cfg.kb8_params
        self.border_mask = border_mask
        self.scale_factors = np.array([cfg.scale_factor**o for o in range(cfg.n_scales)])
        # Headless visualizers, gated like the reference's showScene flags
        # (SLAM.cc:49-50 creates both; Settings.cc:155-189 toggles them).
        self.frame_viz = FrameVisualizer(enabled=cfg.show_scene, out_dir=viz_dir)
        self.map_viz = MapVisualizer(
            enabled=cfg.show_scene or cfg.show_solution,
            out_dir=viz_dir,
            draw_rays=cfg.draw_rays,
        )

    # ------------------------------------------------------------------
    def extract(self, gray: np.ndarray) -> feat_ops.Keypoints:
        kps = feat_ops.extract(
            gray,
            n_features=self.cfg.n_features,
            n_scales=self.cfg.n_scales,
            scale_factor=self.cfg.scale_factor,
            border_mask=self.border_mask,
        )
        if self.cfg.distortion:
            # Radial-tangential keypoint undistortion (Frame::undistortKeys,
            # Frame.cc:252-277): downstream geometry/matching operate on the
            # undistorted positions, like the reference's vKeys_.
            und = cam_ops.undistort_points(
                jnp.asarray(self.cfg.pinhole_params),
                tuple(self.cfg.distortion),
                jnp.asarray(kps.xy),
            )
            kps = kps._replace(xy=und)
        return kps

    @staticmethod
    def depth_at(depth_im: np.ndarray, kp: np.ndarray) -> np.ndarray:
        """Measured depth at pixel locations: bilinear / 100 (Frame.cc:112-116)."""
        return metrics_mod.bilinear_interpolate(depth_im, kp[:, 0], kp[:, 1]) / 100.0

    # ------------------------------------------------------------------
    def initialize_pair(
        self,
        k_ref: feat_ops.Keypoints,
        k_cur: feat_ops.Keypoints,
        T1w,
        T2w,
        depth_ref: np.ndarray,
        depth_cur: np.ndarray,
    ) -> PairInitResult:
        cfg = self.cfg
        sf = jnp.asarray(self.scale_factors)
        matches, n_matches = match_ops.search_for_initialization(
            k_ref.xy,
            k_ref.desc,
            k_ref.octave,
            k_ref.valid,
            k_cur.xy,
            k_cur.desc,
            k_cur.octave,
            k_cur.valid,
            scale_factors=sf,
            th=float(cfg.matching_init_th),
            window_factor=float(cfg.matching_init_radius),
        )
        n_matches = int(n_matches)
        if n_matches < cfg.min_matches:
            return PairInitResult(False, "not enough matches", n_matches)

        m = np.asarray(matches)
        ridx = np.nonzero(m >= 0)[0]
        cidx = m[ridx]
        kp1 = np.asarray(k_ref.xy)[ridx]
        kp2 = np.asarray(k_cur.xy)[cidx]
        oct1 = np.asarray(k_ref.octave)[ridx]
        oct2 = np.asarray(k_cur.octave)[cidx]

        params = jnp.asarray(self.cam_params)
        xn1 = cam_ops.unproject(self.cam_kind, params, jnp.asarray(kp1))
        xn2 = cam_ops.unproject(self.cam_kind, params, jnp.asarray(kp2))
        xn1 = xn1 / jnp.linalg.norm(xn1, axis=-1, keepdims=True)
        xn2 = xn2 / jnp.linalg.norm(xn2, axis=-1, keepdims=True)

        inliers = np.ones(len(kp1), dtype=bool)
        pose_free = T2w is None
        T1w_est = T2w_est = None
        if pose_free:
            # Pose-unknown bootstrap (MonocularMapInitializer.cc:119-279):
            # cluster-sampled RANSAC over batched 8-point hypotheses recovers
            # T21 up to monocular scale; the depth-scale estimates below
            # absorb the gauge, exactly as the reference's optimizable depth
            # scales do.
            import jax as _jax

            if T1w is None:
                T1w = (jnp.eye(3, dtype=FP), jnp.zeros(3, dtype=FP))
            # Config parity: Epipolar.th is unset in some shipped yamls
            # (cv::FileStorage reads 0.0); a zero threshold would zero the
            # RANSAC consensus, so fall back to a permissive default. 0.01 rad
            # sits between the two values the reference ever ships for the
            # angular epipolar test (0.002 strict in Simulation.yaml:32, 0.5
            # loose in Drunkard.yaml:29) -- strict enough to reject gross
            # outliers, loose enough to keep a consensus on noisy endoscopy.
            epi_th = float(cfg.epipolar_th) if cfg.epipolar_th > 0 else 0.01
            R21, t21, inl, _ = epi_ops.initialize_pose_free(
                jnp.asarray(kp1), xn1, xn2, jnp.ones(len(kp1), bool),
                _jax.random.PRNGKey(10), epipolar_th=epi_th,
            )
            # Resolve the monocular scale of t from the depth sensor: a
            # provisional unit-baseline triangulation gives depths z_prov
            # that scale linearly with |t|, so |t| = median(d / z_prov).
            T2w_unit = lie.compose(R21, t21, *T1w)
            x1p, _ = tri.triangulate(xn1, xn2, T1w, T2w_unit, method=tri.NRSLAM)
            z_prov = np.asarray(lie.apply(*T1w, x1p))[:, 2]
            d_prov = self.depth_at(depth_ref, kp1)
            ok = np.asarray(inl) & (z_prov > 0) & (d_prov > 0)
            if ok.sum() >= 8:
                scale = float(np.median(d_prov[ok] / z_prov[ok]))
                t21 = t21 * scale
            T2w = lie.compose(R21, t21, *T1w)
            inliers &= np.asarray(inl)
            T1w_est, T2w_est = T1w, T2w
        if cfg.checks:
            # Epipolar filter with E from the KNOWN relative pose -- what the
            # reference's degenerate RANSAC loop evaluates 17 times
            # (MonocularMapInitializer.cc:119-178 computes E from the pose).
            R12, t12 = lie.compose(*T1w, *lie.inverse(*T2w))
            E = match_ops.essential_from_pose(R12, t12)
            inliers = np.asarray(
                match_ops.epipolar_inliers(E, xn1, xn2, cfg.epipolar_th)
            )

        x1, x2 = tri.triangulate(
            xn1,
            xn2,
            T1w,
            T2w,
            method=cfg.triangulation_method,
            location=cfg.triangulation_location,
        )
        x1, x2 = np.asarray(x1), np.asarray(x2)

        # Gates (reconstructPoints, MonocularMapInitializer.cc:281-395).
        finite = np.isfinite(x1).all(-1) & np.isfinite(x2).all(-1)
        nonzero = (np.abs(x1).sum(-1) > 0) & (np.abs(x2).sum(-1) > 0)
        z1 = (x1 @ np.asarray(T1w[0]).T + np.asarray(T1w[1]))[:, 2]
        z2 = (x2 @ np.asarray(T2w[0]).T + np.asarray(T2w[1]))[:, 2]
        depth_limit = cfg.depth_limit if cfg.depth_limit > 0 else np.inf
        depth_ok = (z1 >= 0) & (z1 <= depth_limit) & (z2 >= 0) & (z2 <= depth_limit)
        valid = inliers & finite & nonzero & depth_ok

        if cfg.checks:
            proj1 = np.asarray(
                cam_ops.project(self.cam_kind, params, jnp.asarray(x1 @ np.asarray(T1w[0]).T + np.asarray(T1w[1])))
            )
            proj2 = np.asarray(
                cam_ops.project(self.cam_kind, params, jnp.asarray(x2 @ np.asarray(T2w[0]).T + np.asarray(T2w[1])))
            )
            chi1 = ((proj1 - kp1) ** 2).sum(-1)
            chi2 = ((proj2 - kp2) ** 2).sum(-1)
            valid &= (chi1 <= 5.991) & (chi2 <= 5.991)

        # Depth-measurement gates from the mapping layer (Mapping.cc:191-200).
        d1 = self.depth_at(depth_ref, kp1)
        d2 = self.depth_at(depth_cur, kp2)
        valid &= (d1 > 0) & (d2 > 0)
        # Reference quirk kept verbatim: the mapping layer rejects keypoints
        # outside the fixed (0.1, 1500) px box regardless of the actual image
        # size (Mapping.cc:197-199).
        valid &= (kp1 > 0.1).all(-1) & (kp1 < 1500).all(-1)
        valid &= (kp2 > 0.1).all(-1) & (kp2 < 1500).all(-1)

        n_tri = int(valid.sum())
        if n_tri == 0:
            return PairInitResult(False, "no triangulated points", n_matches)

        # Parallax statistic: 50th smallest cosine (largest angles),
        # reconstructPoints (MonocularMapInitializer.cc:374-395).
        R1i, _ = lie.inverse(*T1w)
        R2i, _ = lie.inverse(*T2w)
        ray1 = np.asarray(xn1) @ np.asarray(R1i).T
        ray2 = np.asarray(xn2) @ np.asarray(R2i).T
        cosp = (ray1 * ray2).sum(-1) / (
            np.linalg.norm(ray1, axis=-1) * np.linalg.norm(ray2, axis=-1)
        )
        cos_sorted = np.sort(cosp[valid])
        idx = min(50, len(cos_sorted) - 1)
        parallax_deg = float(np.degrees(np.arccos(np.clip(cos_sorted[idx], -1, 1))))

        if not (n_tri * 2 >= 25 and parallax_deg > cfg.min_cos):
            return PairInitResult(
                False, "parallax/points gate", n_matches, 2 * n_tri, parallax_deg
            )

        # Depth-scale estimation over sufficiently-parallaxed points
        # (Mapping.cc:211-254).
        deg = np.degrees(np.arccos(np.clip(cosp, -1, 1)))
        sel = valid & (deg > cfg.min_cos)
        if sel.sum() == 0:
            sel = valid
        r1 = d1[sel] / z1[sel]
        r2 = d2[sel] / z2[sel]
        s1, s2 = float(r1.mean()), float(r2.mean())
        # Standard error of the scale estimate -> depth-scale prior info
        # (see deformable.PairData; real-data scatter makes this a weak
        # anchor, simulation-grade depth a strong one).
        n_sel = max(len(r1), 1)
        se1 = max(float(r1.std()) / np.sqrt(n_sel), 1e-6)
        se2 = max(float(r2.std()) / np.sqrt(n_sel), 1e-6)
        scale_priors = (s1, 1.0 / se1**2, s2, 1.0 / se2**2)

        return PairInitResult(
            True,
            "ok",
            n_matches,
            2 * n_tri,
            parallax_deg,
            kp1=kp1,
            kp2=kp2,
            p1=x1,
            p2=x2,
            valid=valid,
            octave1=oct1,
            octave2=oct2,
            d1=d1,
            d2=d2,
            s1=s1,
            s2=s2,
            T1w_est=T1w_est,
            T2w_est=T2w_est,
            scale_priors=scale_priors,
        )

    # ------------------------------------------------------------------
    def run(
        self,
        loader,
        start: int = 0,
        end: Optional[int] = None,
        step: int = 1,
        journal_path: Optional[str] = None,
        mesh_backend: str = "auto",
    ):
        """Frame loop; stops after the first triangulated pair (ref mains)."""
        cfg = self.cfg
        ref = None
        ref_pose = None
        ref_depth = None
        ref_gray = None

        for idx, rgb, depth, pose, ts in loader.frames(start, end, step):
            gray = to_grayscale(rgb)
            kps = self.extract(gray)
            self.frame_viz.draw_features(
                np.asarray(kps.xy), gray, np.asarray(kps.valid), name="features"
            )
            # Loaders without trajectory ground truth yield pose None; the
            # pair bootstrap then recovers it (pose-unknown initialization).
            Tcw = None
            if pose is not None and pose[0] is not None:
                R_wc, t_wc = pose
                Tcw = lie.inverse(jnp.asarray(R_wc), jnp.asarray(t_wc))
            if ref is None:
                ref, ref_pose, ref_depth, ref_gray = kps, Tcw, depth, gray
                self.frame_viz.set_reference_frame(np.asarray(kps.xy), gray)
                continue

            init = self.initialize_pair(ref, kps, ref_pose, Tcw, ref_depth, depth)
            if not init.accepted:
                if init.n_matches < cfg.min_matches:
                    ref, ref_pose, ref_depth, ref_gray = kps, Tcw, depth, gray
                    self.frame_viz.set_reference_frame(np.asarray(kps.xy), gray)
                continue

            if self.frame_viz.enabled:
                # The match list is already compacted to pairs; identity
                # correspondence reproduces drawFrameMatches/-Triangulated.
                pairing = np.arange(len(init.kp1))
                self.frame_viz.draw_matches(
                    init.kp1, ref_gray, init.kp2, gray, pairing, name="matches"
                )
                self.frame_viz.draw_triangulated_matches(
                    init.kp2, gray, pairing, init.valid, name="triangulated"
                )

            T1w_use = init.T1w_est if init.T1w_est is not None else ref_pose
            T2w_use = init.T2w_est if init.T2w_est is not None else Tcw
            return self._refine_and_report(
                init, T1w_use, T2w_use, journal_path, mesh_backend
            )
        return None

    def _refine_and_report(self, init: PairInitResult, T1w, T2w, journal_path, mesh_backend):
        cfg = self.cfg
        inv_s2_1 = 1.0 / self.scale_factors[init.octave1] ** 2
        inv_s2_2 = 1.0 / self.scale_factors[init.octave2] ** 2

        state = deformable.PairState(
            p1=jnp.asarray(init.p1),
            p2=jnp.asarray(init.p2),
            s1=jnp.asarray(init.s1),
            s2=jnp.asarray(init.s2),
            Rg=jnp.eye(3, dtype=FP),
            tg=jnp.zeros(3, dtype=FP),
        )

        journal = ExperimentJournal(journal_path or cfg.exp_file_path)
        t1 = np.asarray(lie.inverse(*T1w)[1])
        t2 = np.asarray(lie.inverse(*T2w)[1])
        journal.header(
            float(np.linalg.norm(t2 - t1)), init.parallax_deg, init.n_matches, init.n_triangulated
        )

        def measure(st):
            pix = metrics_mod.pixels_stand_dev(
                self.cam_kind, self.cam_params, T1w, T2w, st.p1, st.p2, init.kp1, init.kp2, init.valid
            )
            rel = metrics_mod.relative_map_errors(
                T1w, T2w, st.p1, st.p2, float(st.s1), float(st.s2), init.d1, init.d2,
                init.valid, st.Rg, st.tg,
            )
            abs_err = metrics_mod.real_absolute_errors(
                self.cfg.pinhole_params, T1w, T2w, st.p1, st.p2, init.kp1, init.kp2,
                init.d1, init.d2, init.valid,
            )
            return pix, rel, abs_err

        pix0, rel0, abs0 = measure(state)
        journal.block_header("INITIAL MEASUREMENTS:")
        journal.relative(pix0, rel0)
        journal.real_absolute(abs0)

        depth_w = cfg.sim_depth_weight if cfg.sim_depth_weight > 0 else cfg.sim_depth_error
        ocfg = outer.OuterConfig(
            rep_w=cfg.opt_rep_weight,
            global_w=cfg.opt_global_weight,
            arap_w=cfg.opt_arap_weight,
            alpha=cfg.opt_alpha_weight,
            beta=cfg.opt_beta_weight,
            depth_sigma=depth_w / 1000.0,
            n_optimizations=cfg.n_optimizations,
            n_opt_iterations=cfg.n_opt_iterations,
            opt_selection=cfg.opt_selection,
            weights_selection=cfg.opt_weights_selection,
            nlopt_max_eval=cfg.nlopt_n_optimizations,
            nlopt_rel_tol=cfg.nlopt_rel_tolerance,
            nlopt_abs_tol=cfg.nlopt_abs_tolerance,
            lower_bounds=(cfg.nlopt_rep_lower, cfg.nlopt_global_lower, cfg.nlopt_arap_lower),
            upper_bounds=(cfg.nlopt_rep_upper, cfg.nlopt_global_upper, cfg.nlopt_arap_upper),
            model=cfg.opt_model,
        )

        def on_round(i, st, w):
            journal.block_header(f"{i} / {ocfg.n_optimizations} MEASUREMENTS:")
            pix, rel, abs_err = measure(st)
            journal.relative(pix, rel)
            journal.real_absolute(abs_err)

        result = outer.deformation_optimization(
            self.cam_kind,
            self.cam_params,
            T1w,
            T2w,
            init.kp1,
            init.kp2,
            init.d1,
            init.d2,
            init.valid,
            state,
            ocfg,
            on_round=on_round,
            mesh_backend=mesh_backend,
            scale_priors=init.scale_priors,
        )

        journal.block_header("FINAL MEASUREMENTS:")
        pix1, rel1, abs1 = measure(result.state)
        journal.relative(pix1, rel1)
        journal.real_absolute(abs1)

        if self.map_viz.enabled:
            cam_centers = [
                (np.asarray(R).T, -np.asarray(R).T @ np.asarray(t)) for R, t in (T1w, T2w)
            ]
            v = np.asarray(init.valid, dtype=bool)
            self.map_viz.update(
                np.asarray(result.state.p1)[v], np.asarray(result.state.p2)[v], cam_centers
            )
            self.map_viz.snapshot()
            self.map_viz.export_ply()

        # Map-layer insertion (Mapping.cc:183-247 + Map.cc:323-343): dual
        # points per match with observations and the refined global SE3.
        from .worldmap import build_pair_map

        wmap = build_pair_map(
            T1w, T2w, init.kp1, init.kp2, None, None, init.octave1, init.octave2,
            init.d1, init.d2, result.state, init.valid,
            scale_factor=cfg.scale_factor, n_scales=cfg.n_scales,
        )

        return {
            "init": init,
            "state": result.state,
            "weights": result.weights,
            "initial": abs0,
            "final": abs1,
            "initial_pix": pix0,
            "final_pix": pix1,
            "world_map": wmap,
        }
