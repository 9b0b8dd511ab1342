"""Unit tests for the style-evaluation statistics (tools/eval_style.py).

These pin the de-circularized metric tiers' numeric core (VERDICT r3 #9):
the saturation-weighted hue histogram must ignore near-gray pixels (whose
hue is numerical noise that ties toward red), and the circular EMD must be
rotation-invariant and metric-like.
"""

import numpy as np
import pytest

from tools.eval_style import (
    HUE_WEIGHT_FLOOR,
    chroma_angle_deg,
    chroma_dist,
    circular_emd,
    hue_stats,
    rgb_to_hsv,
)


class TestRgbToHsv:
    def test_matches_colorsys(self):
        import colorsys

        rng = np.random.default_rng(0)
        rgb = rng.random((64, 3))
        h, s, v = rgb_to_hsv(rgb)
        for i in range(rgb.shape[0]):
            he, se, ve = colorsys.rgb_to_hsv(*rgb[i])
            assert h[i] == pytest.approx(he % 1.0, abs=1e-9)
            assert s[i] == pytest.approx(se, abs=1e-9)
            assert v[i] == pytest.approx(ve, abs=1e-9)

    def test_gray_has_zero_sat(self):
        g = np.full((5, 3), 0.42)
        _, s, v = rgb_to_hsv(g)
        assert np.all(s == 0.0) and np.all(v == 0.42)


class TestHueStats:
    def test_near_gray_pixels_excluded(self):
        # a nearly-gray image (chroma weight < floor): hue ties toward
        # red (bin 0) numerically, but the histogram must be EMPTY, not
        # red-concentrated — this is exactly the artifact that made the
        # bare avatar "score well" against warm style targets.
        rng = np.random.default_rng(1)
        rgb = 0.5 + 0.004 * rng.standard_normal((1, 256, 3))
        st = hue_stats(rgb)
        assert sum(st["hue_hist"]) == pytest.approx(0.0)

    def test_saturated_pixels_concentrate(self):
        red = np.zeros((1, 100, 3))
        red[..., 0] = 1.0
        st = hue_stats(red)
        assert st["hue_hist"][0] == pytest.approx(1.0)
        assert st["mean_hue"] == pytest.approx(0.0, abs=1e-6)
        assert st["mean_sat"] == pytest.approx(1.0)

    def test_floor_is_on_weight_not_saturation(self):
        # saturated but very dark pixels (v small -> s*v < floor) are
        # excluded too: their hue is real but carries no visual mass.
        dark = np.zeros((1, 10, 3))
        dark[..., 1] = HUE_WEIGHT_FLOOR / 2  # green, v = floor/2, s = 1
        st = hue_stats(dark)
        assert sum(st["hue_hist"]) == pytest.approx(0.0)

    def test_mixed_image_reads_only_chromatic_part(self):
        rgb = np.zeros((1, 200, 3))
        rgb[0, :100] = 0.5  # gray half: no weight
        rgb[0, 100:, 2] = 1.0  # blue half (hue 2/3)
        st = hue_stats(rgb)
        blue_bin = int((2.0 / 3.0) * len(st["hue_hist"]))
        assert st["hue_hist"][blue_bin] == pytest.approx(1.0)
        assert st["mean_hue"] == pytest.approx(2.0 / 3.0, abs=1e-3)


class TestChromaVec:
    def test_gray_is_origin(self):
        g = np.full((1, 50, 3), 0.5)
        cv = hue_stats(g)["chroma_vec"]
        assert abs(cv[0]) < 1e-6 and abs(cv[1]) < 1e-6

    def test_pure_red_points_along_positive_x(self):
        red = np.zeros((1, 50, 3))
        red[..., 0] = 1.0
        cv = hue_stats(red)["chroma_vec"]
        assert cv[0] == pytest.approx(1.0, abs=1e-4)
        assert cv[1] == pytest.approx(0.0, abs=1e-4)

    def test_chroma_dist_separates_gray_from_chromatic(self):
        gray = np.full((1, 50, 3), 0.5)
        red = np.zeros((1, 50, 3))
        red[..., 0] = 1.0
        green = np.zeros((1, 50, 3))
        green[..., 1] = 1.0
        cg = hue_stats(gray)["chroma_vec"]
        cr = hue_stats(red)["chroma_vec"]
        ce = hue_stats(green)["chroma_vec"]
        # gray is equidistant from red and green targets (no positional
        # bias — the failure mode of EMD against an empty histogram)
        assert chroma_dist(cg, cr) == pytest.approx(chroma_dist(cg, ce), abs=1e-4)
        # and a red render is much closer to the red target than gray is
        assert chroma_dist(cr, cr) < 1e-9
        assert chroma_dist(cg, cr) > 0.9


class TestChromaAngle:
    def test_identical_direction_is_zero(self):
        assert chroma_angle_deg([0.8, 0.2], [0.8, 0.2]) == pytest.approx(0.0)

    def test_scale_invariant(self):
        # the txt2img centroid is SHORT (samples are mostly background);
        # alignment must not depend on magnitude — this is exactly the
        # failure mode of Euclidean centroid distance.
        a = [0.80, 0.20]
        short = [0.060, 0.015]  # same direction, 13x shorter
        assert chroma_angle_deg(a, short) == pytest.approx(0.0, abs=1e-6)

    def test_red_vs_green_is_120(self):
        red = hue_stats(np.eye(3)[None, :1].repeat(8, 1))["chroma_vec"]
        green = np.zeros((1, 8, 3))
        green[..., 1] = 1.0
        g = hue_stats(green)["chroma_vec"]
        assert chroma_angle_deg(red, g) == pytest.approx(120.0, abs=0.5)

    def test_achromatic_has_no_direction(self):
        gray = hue_stats(np.full((1, 8, 3), 0.5))["chroma_vec"]
        assert chroma_angle_deg(gray, [0.8, 0.2]) is None
        assert chroma_angle_deg([0.8, 0.2], gray) is None

    def test_opposite_is_180(self):
        assert chroma_angle_deg([1.0, 0.0], [-0.5, 0.0]) == pytest.approx(180.0)


class TestCircularEmd:
    def test_empty_histogram_returns_none(self):
        p = np.zeros(16)
        q = np.zeros(16)
        q[3] = 1.0
        assert circular_emd(p, q) is None
        assert circular_emd(q, p) is None
        assert circular_emd(p, p) is None

    def test_identical_is_zero(self):
        p = np.array([0.25, 0.25, 0.25, 0.25])
        assert circular_emd(p, p) == pytest.approx(0.0)

    def test_rotation_invariance(self):
        rng = np.random.default_rng(2)
        p = rng.random(16)
        p /= p.sum()
        q = rng.random(16)
        q /= q.sum()
        d0 = circular_emd(p, q)
        for k in (1, 5, 9):
            dk = circular_emd(np.roll(p, k), np.roll(q, k))
            assert dk == pytest.approx(d0, abs=1e-12)

    def test_wraparound_cheaper_than_linear(self):
        # mass at bin 0 vs bin 15 of 16: circular distance is 1 step, not 15
        p = np.zeros(16)
        p[0] = 1.0
        q = np.zeros(16)
        q[15] = 1.0
        assert circular_emd(p, q) == pytest.approx(1.0 / 16.0)

    def test_symmetry(self):
        rng = np.random.default_rng(3)
        p = rng.random(16)
        p /= p.sum()
        q = rng.random(16)
        q /= q.sum()
        assert circular_emd(p, q) == pytest.approx(circular_emd(q, p))
