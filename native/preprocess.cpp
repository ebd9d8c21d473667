// Native preprocessing core for the data layer.
//
// The reference's dataset __getitem__ is the CPU-bound second hot path
// (SURVEY.md §3.5): per sample it rasterizes 18 gaussian keypoint
// heatmaps, draws thick arm polylines, and runs 5 iterations of 5x5
// dilation — in Python/PIL/cv2 inside DataLoader workers.  This library
// implements those inner loops in C++ (OpenMP-free, single-pass,
// cache-friendly) and is bound via ctypes
// (ladi_vton_tpu/data/native.py); the numpy implementations in
// data/raster.py remain the oracle and fallback.
//
// Build: `make -C native` (g++ -O3 -shared, zero dependencies).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Gaussian heatmaps: one (H, W) float32 map per keypoint,
// exp(-d^2/sigma^2), max-normalized; zero map when both coords <= 0
// (matches reference posemap.py:6-34 / data/raster.py).
void keypoint_heatmaps(const float* kpoints, int n_points, int height,
                       int width, float sigma, float* out) {
    const float inv_s2 = 1.0f / (sigma * sigma);
    for (int p = 0; p < n_points; ++p) {
        float x = kpoints[2 * p];
        float y = kpoints[2 * p + 1];
        float* map = out + (size_t)p * height * width;
        if (!(x > 0.0f || y > 0.0f)) {
            std::memset(map, 0, sizeof(float) * height * width);
            continue;
        }
        float maxv = 0.0f;
        for (int i = 0; i < height; ++i) {
            float dy = (float)i - y;
            float dy2 = dy * dy;
            float* row = map + (size_t)i * width;
            for (int j = 0; j < width; ++j) {
                float dx = (float)j - x;
                float v = std::exp(-(dx * dx + dy2) * inv_s2);
                row[j] = v;
                maxv = std::max(maxv, v);
            }
        }
        const float norm = 1.0f / (maxv + 1.1920929e-07f);
        for (size_t i = 0; i < (size_t)height * width; ++i) map[i] *= norm;
    }
}

// Thick polyline with PIL semantics: flat-capped segment rectangles +
// round disks at *interior* joints (joint='curve'); coordinates
// pre-truncated to uint16 per the caller's contract (data/raster.py).
// Writes 1.0 into covered pixels of `out`.
void draw_polyline(const float* points, int n_points, int height,
                   int width, float line_width, float* out) {
    if (n_points < 2) return;
    const float r = line_width * 0.5f;
    const float r2 = r * r;
    for (int s = 0; s + 1 < n_points; ++s) {
        float x0 = (float)(uint16_t)points[2 * s];
        float y0 = (float)(uint16_t)points[2 * s + 1];
        float x1 = (float)(uint16_t)points[2 * s + 2];
        float y1 = (float)(uint16_t)points[2 * s + 3];
        float dx = x1 - x0, dy = y1 - y0;
        float len2 = dx * dx + dy * dy;
        if (len2 == 0.0f) continue;
        int jy0 = std::max(0, (int)std::floor(std::min(y0, y1) - r));
        int jy1 = std::min(height - 1, (int)std::ceil(std::max(y0, y1) + r));
        int jx0 = std::max(0, (int)std::floor(std::min(x0, x1) - r));
        int jx1 = std::min(width - 1, (int)std::ceil(std::max(x0, x1) + r));
        for (int i = jy0; i <= jy1; ++i) {
            float* row = out + (size_t)i * width;
            for (int j = jx0; j <= jx1; ++j) {
                float t = ((j - x0) * dx + (i - y0) * dy) / len2;
                if (t < 0.0f || t > 1.0f) continue;  // flat caps
                float px = x0 + t * dx, py = y0 + t * dy;
                float ddx = j - px, ddy = i - py;
                if (ddx * ddx + ddy * ddy <= r2) row[j] = 1.0f;
            }
        }
    }
    // round joints at interior vertices
    for (int p = 1; p + 1 < n_points; ++p) {
        float cx = (float)(uint16_t)points[2 * p];
        float cy = (float)(uint16_t)points[2 * p + 1];
        int jy0 = std::max(0, (int)std::floor(cy - r));
        int jy1 = std::min(height - 1, (int)std::ceil(cy + r));
        int jx0 = std::max(0, (int)std::floor(cx - r));
        int jx1 = std::min(width - 1, (int)std::ceil(cx + r));
        for (int i = jy0; i <= jy1; ++i) {
            float* row = out + (size_t)i * width;
            for (int j = jx0; j <= jx1; ++j) {
                float ddx = j - cx, ddy = i - cy;
                if (ddx * ddx + ddy * ddy <= r2) row[j] = 1.0f;
            }
        }
    }
}

// Binary dilation with a k x k box kernel applied `iterations` times ==
// one (it*(k-1)+1) box dilation (matches ops/morphology.py; replaces
// cv2.dilate at reference dresscode.py:350).  Separable two-pass
// max-filter: O(HW) per axis with a sliding window.
void box_dilate(const float* in, int height, int width, int kernel,
                int iterations, float* out) {
    int eff = iterations * (kernel - 1) + 1;
    int half = (eff - 1) / 2;
    int hi_pad = eff - 1 - half;
    // horizontal pass -> out, vertical pass -> out (in place via temp col)
    float* tmp = new float[(size_t)height * width];
    for (int i = 0; i < height; ++i) {
        const float* row = in + (size_t)i * width;
        float* trow = tmp + (size_t)i * width;
        for (int j = 0; j < width; ++j) {
            int a = std::max(0, j - half);
            int b = std::min(width - 1, j + hi_pad);
            float m = 0.0f;
            for (int t = a; t <= b; ++t) m = std::max(m, row[t]);
            trow[j] = m;
        }
    }
    for (int j = 0; j < width; ++j) {
        for (int i = 0; i < height; ++i) {
            int a = std::max(0, i - half);
            int b = std::min(height - 1, i + hi_pad);
            float m = 0.0f;
            for (int t = a; t <= b; ++t)
                m = std::max(m, tmp[(size_t)t * width + j]);
            out[(size_t)i * width + j] = m;
        }
    }
    delete[] tmp;
}

// uint8 HWC image resize, bilinear with half-pixel centers
// (antialias-free; matches ops/resize.py semantics) — the jpg-decode ->
// resize step dominates dataset IO on a single-core host.
void resize_bilinear_u8(const uint8_t* in, int in_h, int in_w,
                        int channels, int out_h, int out_w,
                        uint8_t* out) {
    const float sy = (float)in_h / out_h;
    const float sx = (float)in_w / out_w;
    for (int i = 0; i < out_h; ++i) {
        float fy = (i + 0.5f) * sy - 0.5f;
        fy = std::min((float)(in_h - 1), std::max(0.0f, fy));
        int y0 = (int)fy;
        int y1 = std::min(in_h - 1, y0 + 1);
        float wy = fy - y0;
        for (int j = 0; j < out_w; ++j) {
            float fx = (j + 0.5f) * sx - 0.5f;
            fx = std::min((float)(in_w - 1), std::max(0.0f, fx));
            int x0 = (int)fx;
            int x1 = std::min(in_w - 1, x0 + 1);
            float wx = fx - x0;
            const uint8_t* p00 = in + ((size_t)y0 * in_w + x0) * channels;
            const uint8_t* p01 = in + ((size_t)y0 * in_w + x1) * channels;
            const uint8_t* p10 = in + ((size_t)y1 * in_w + x0) * channels;
            const uint8_t* p11 = in + ((size_t)y1 * in_w + x1) * channels;
            uint8_t* dst = out + ((size_t)i * out_w + j) * channels;
            for (int c = 0; c < channels; ++c) {
                float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c])
                        + wy * ((1 - wx) * p10[c] + wx * p11[c]);
                dst[c] = (uint8_t)(v + 0.5f);
            }
        }
    }
}

}  // extern "C"
