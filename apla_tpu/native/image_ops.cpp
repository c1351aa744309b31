// Native host-side image kernels for the input pipeline.
//
// The reference's data path runs PIL transforms in DataLoader worker
// processes (src/defaults/bases.py:26-58); its native performance comes from
// PIL/torchvision C code.  Here the hot tail of every pipeline —
// crop -> bilinear/bicubic resize -> /255 -> normalize — is one fused C++
// kernel over uint8 HWC buffers, called via ctypes from worker threads
// (no GIL held while running).
//
// Build: g++ -O3 -march=native -shared -fPIC image_ops.cpp -o libimage_ops.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>

#include "bilinear_u8.h"

extern "C" {

// Bilinear resize uint8 HWC -> uint8 HWC (shared kernel).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
    bilinear_resize_u8(src, sh, sw, c, dst, dh, dw);
}

// Fused: crop [cy, cy+chh) x [cx, cx+cww) of uint8 HWC, bilinear-resize to
// (dh, dw), then out = (v/255 - mean[c]) / std[c] as float32 HWC.
void crop_resize_normalize(const uint8_t* src, int sh, int sw, int c,
                           int cy, int cx, int chh, int cww,
                           float* dst, int dh, int dw,
                           const float* mean, const float* stdv) {
    const float scale_y = (float)chh / dh;
    const float scale_x = (float)cww / dw;
    float inv_std[16];
    float m255[16];
    for (int ch = 0; ch < c && ch < 16; ++ch) {
        inv_std[ch] = 1.0f / (255.0f * stdv[ch]);
        m255[ch] = mean[ch] * 255.0f;
    }
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * scale_y - 0.5f + cy;
        int y0 = (int)std::floor(fy);
        float wy = fy - y0;
        int y1 = std::min(y0 + 1, sh - 1);
        y0 = std::min(std::max(y0, 0), sh - 1);
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * scale_x - 0.5f + cx;
            int x0 = (int)std::floor(fx);
            float wx = fx - x0;
            int x1 = std::min(x0 + 1, sw - 1);
            x0 = std::min(std::max(x0, 0), sw - 1);
            const uint8_t* p00 = src + (y0 * sw + x0) * c;
            const uint8_t* p01 = src + (y0 * sw + x1) * c;
            const uint8_t* p10 = src + (y1 * sw + x0) * c;
            const uint8_t* p11 = src + (y1 * sw + x1) * c;
            float* out = dst + (y * dw + x) * c;
            for (int ch = 0; ch < c; ++ch) {
                float top = p00[ch] * (1 - wx) + p01[ch] * wx;
                float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
                float v = top * (1 - wy) + bot * wy;
                out[ch] = (v - m255[ch]) * inv_std[ch];
            }
        }
    }
}

// Normalize only: uint8 HWC -> float32 HWC, (v/255 - mean)/std.
void normalize_u8(const uint8_t* src, int n_pixels, int c,
                  const float* mean, const float* stdv, float* dst) {
    float inv_std[16];
    float m255[16];
    for (int ch = 0; ch < c && ch < 16; ++ch) {
        inv_std[ch] = 1.0f / (255.0f * stdv[ch]);
        m255[ch] = mean[ch] * 255.0f;
    }
    for (int i = 0; i < n_pixels; ++i) {
        const uint8_t* p = src + i * c;
        float* out = dst + i * c;
        for (int ch = 0; ch < c; ++ch) {
            out[ch] = (p[ch] - m255[ch]) * inv_std[ch];
        }
    }
}

// Horizontal flip in place, uint8 HWC.
void hflip_u8(uint8_t* img, int h, int w, int c) {
    for (int y = 0; y < h; ++y) {
        uint8_t* row = img + y * w * c;
        for (int x = 0; x < w / 2; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                std::swap(row[x * c + ch], row[(w - 1 - x) * c + ch]);
            }
        }
    }
}

}  // extern "C"
