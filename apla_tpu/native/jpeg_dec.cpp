// Native JPEG decode (+ optional resize) for the input pipeline.
//
// The reference decodes with PIL in DataLoader worker processes; this
// framework's loader uses THREADS, so the decode path must release the GIL
// and be cheap.  libjpeg's DCT-domain scaling (scale_num/8) decodes
// directly at ~the target resolution — for a 2048px photo resized to 256px
// that skips ~98% of the IDCT work — then a bilinear pass hits the exact
// output size.
//
// Build: g++ -O3 -shared -fPIC jpeg_dec.cpp -o libjpeg_dec.so -ljpeg

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <cmath>

#include <jpeglib.h>

#include "bilinear_u8.h"

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
    ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(err->jump, 1);
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer to RGB uint8 HWC.
//   out_h/out_w == 0: decode at full size; *got_h/*got_w return the dims
//                     (call with out == nullptr first to query, or pass a
//                     buffer of max_h*max_w*3 and check the dims).
//   out_h/out_w  > 0: decode (DCT-scaled) then bilinear to exactly
//                     [out_h, out_w, 3].
// Returns 0 on success, nonzero on decode error.
int jpeg_decode_resize(const uint8_t* data, long len,
                       int out_h, int out_w,
                       uint8_t* out, long out_cap,
                       int* got_h, int* got_w) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    // volatile: survives the longjmp so a decode error mid-scanlines can
    // free the temp buffer (it leaked per corrupt file otherwise)
    uint8_t* volatile tmp_guard = nullptr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jump)) {
        delete[] tmp_guard;
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    cinfo.out_color_space = JCS_RGB;

    if (out_h > 0 && out_w > 0) {
        // pick the smallest DCT scale (8/8..1/8) still >= the target
        int num = 8;
        while (num > 1 &&
               (int)cinfo.image_height * (num - 1) / 8 >= out_h &&
               (int)cinfo.image_width * (num - 1) / 8 >= out_w) {
            --num;
        }
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
    }
    jpeg_start_decompress(&cinfo);
    const int dh = cinfo.output_height, dw = cinfo.output_width;
    const int c = cinfo.output_components;  // 3 for RGB (grayscale -> 1)

    uint8_t* tmp = nullptr;
    uint8_t* target = out;
    bool need_resize = (out_h > 0 && (dh != out_h || dw != out_w));
    bool expand_gray = (c == 1);
    if (need_resize || expand_gray) {
        tmp = new uint8_t[(size_t)dh * dw * c];
        tmp_guard = tmp;
        target = tmp;
    } else if ((long)dh * dw * c > out_cap) {
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }

    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = target + (size_t)cinfo.output_scanline * dw * c;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);

    if (expand_gray) {
        // L -> RGB in place of a second temp
        uint8_t* rgb = new uint8_t[(size_t)dh * dw * 3];
        for (long i = 0; i < (long)dh * dw; ++i) {
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = tmp[i];
        }
        delete[] tmp;
        tmp = rgb;
        tmp_guard = tmp;
        target = tmp;
    }

    if (need_resize) {
        if ((long)out_h * out_w * 3 > out_cap) {
            delete[] tmp;
            return 3;
        }
        bilinear_resize_u8(target, dh, dw, 3, out, out_h, out_w);
        *got_h = out_h;
        *got_w = out_w;
        delete[] tmp;
        return 0;
    }
    if (tmp) {  // grayscale full-size path
        if ((long)dh * dw * 3 > out_cap) {
            delete[] tmp;
            return 3;
        }
        std::memcpy(out, tmp, (size_t)dh * dw * 3);
        delete[] tmp;
    }
    *got_h = dh;
    *got_w = dw;
    return 0;
}

}  // extern "C"
