// Native runtime components for sift_tpu.
//
// The reference implements its image container, codecs (vendored stb) and
// drawing rasterizers in C++ (/root/reference/src/stb_image.h,
// image_io.cpp, image.cpp:245-328).  This library is the TPU-era
// equivalent: a threaded, prefetching image loader (libjpeg/libpng decode
// straight into float32 [0,255] arrays ready for device upload) and the
// drawing rasterizers used for keypoints.png / matches.png artifacts.
// Exposed through a plain C ABI consumed via ctypes
// (sift_tpu/utils/native.py) — no pybind11 dependency.
//
// Build: make -C csrc   (produces sift_tpu/_native.so)

#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct DecodedImage {
    float* data;  // HWC float32 in [0, 255]
    int width;
    int height;
    int channels;
};

static bool has_suffix(const std::string& s, const char* suf) {
    std::string l = s;
    for (auto& ch : l) ch = tolower(ch);
    std::string t(suf);
    return l.size() >= t.size() && l.compare(l.size() - t.size(), t.size(), t) == 0;
}

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

static bool decode_jpeg(const char* path, DecodedImage* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        // A longjmp after allocation must not leak the partial pixel buffer.
        free(out->data);
        out->data = nullptr;
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width;
    const int h = cinfo.output_height;
    const int c = cinfo.output_components;  // 3 for JCS_RGB
    out->data = static_cast<float*>(malloc(sizeof(float) * w * h * c));
    out->width = w;
    out->height = h;
    out->channels = c;
    std::vector<JSAMPLE> row(w * c);
    JSAMPROW rows[1] = {row.data()};
    while (cinfo.output_scanline < cinfo.output_height) {
        const int y = cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, rows, 1);
        float* dst = out->data + static_cast<size_t>(y) * w * c;
        for (int i = 0; i < w * c; ++i) dst[i] = static_cast<float>(row[i]);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

static bool decode_png(const char* path, DecodedImage* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) {
        fclose(f);
        return false;
    }
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        free(out->data);
        out->data = nullptr;
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
                 nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    // Drop alpha like the reference (image_io.cpp:27 clamps channels to 3).
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    const int c = png_get_channels(png, info);
    out->data = static_cast<float*>(malloc(sizeof(float) * w * h * c));
    out->width = static_cast<int>(w);
    out->height = static_cast<int>(h);
    out->channels = c;
    std::vector<png_byte> row(png_get_rowbytes(png, info));
    for (png_uint_32 y = 0; y < h; ++y) {
        png_read_row(png, row.data(), nullptr);
        float* dst = out->data + static_cast<size_t>(y) * w * c;
        for (png_uint_32 i = 0; i < w * c; ++i)
            dst[i] = static_cast<float>(row[i]);
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return true;
}

int sift_decode_image(const char* path, float** data, int* width, int* height,
                      int* channels) {
    DecodedImage img{};
    bool ok = false;
    std::string p(path);
    if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
        ok = decode_jpeg(path, &img);
    else if (has_suffix(p, ".png"))
        ok = decode_png(path, &img);
    else {
        ok = decode_jpeg(path, &img) || decode_png(path, &img);
    }
    if (!ok) return 0;
    *data = img.data;
    *width = img.width;
    *height = img.height;
    *channels = img.channels;
    return 1;
}

void sift_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Threaded prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
    std::vector<std::string> paths;
    std::vector<std::thread> workers;
    std::mutex mu;
    std::condition_variable cv_ready;
    std::queue<std::pair<size_t, DecodedImage>> ready;
    size_t next_fetch = 0;
    size_t next_emit = 0;
    size_t max_queue = 8;
    bool stop = false;
    std::vector<std::pair<size_t, DecodedImage>> stash;  // out-of-order buffer

    void worker() {
        for (;;) {
            size_t idx;
            {
                std::lock_guard<std::mutex> lk(mu);
                if (stop || next_fetch >= paths.size()) return;
                idx = next_fetch++;
            }
            DecodedImage img{};
            if (!sift_decode_image(paths[idx].c_str(), &img.data, &img.width,
                                   &img.height, &img.channels)) {
                img.data = nullptr;
            }
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_ready.wait(lk, [&] { return stop || ready.size() < max_queue; });
                if (stop) {
                    free(img.data);
                    return;
                }
                ready.push({idx, img});
                cv_ready.notify_all();
            }
        }
    }
};

void* sift_loader_create(const char** paths, int n, int n_threads) {
    auto* l = new Loader();
    for (int i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
    l->max_queue = std::max(8, n_threads * 2);
    for (int i = 0; i < n_threads; ++i)
        l->workers.emplace_back([l] { l->worker(); });
    return l;
}

// Returns images strictly in submission order.
int sift_loader_next(void* handle, float** data, int* width, int* height,
                     int* channels) {
    auto* l = static_cast<Loader*>(handle);
    if (l->next_emit >= l->paths.size()) return 0;
    const size_t want = l->next_emit;
    for (;;) {
        std::unique_lock<std::mutex> lk(l->mu);
        for (auto it = l->stash.begin(); it != l->stash.end(); ++it) {
            if (it->first == want) {
                DecodedImage img = it->second;
                l->stash.erase(it);
                l->next_emit++;
                *data = img.data;
                *width = img.width;
                *height = img.height;
                *channels = img.channels;
                return img.data != nullptr;
            }
        }
        l->cv_ready.wait(lk, [&] { return !l->ready.empty(); });
        while (!l->ready.empty()) {
            l->stash.push_back(l->ready.front());
            l->ready.pop();
        }
        l->cv_ready.notify_all();
    }
}

void sift_loader_destroy(void* handle) {
    auto* l = static_cast<Loader*>(handle);
    {
        std::lock_guard<std::mutex> lk(l->mu);
        l->stop = true;
        l->cv_ready.notify_all();
    }
    for (auto& t : l->workers) t.join();
    while (!l->ready.empty()) {
        free(l->ready.front().second.data);
        l->ready.pop();
    }
    for (auto& s : l->stash) free(s.second.data);
    delete l;
}

// ---------------------------------------------------------------------------
// Drawing rasterizers (reference semantics: src/image.cpp:245-328)
// ---------------------------------------------------------------------------

static void set_rgb(float* img, int w, int h, int c, int x, int y, int color) {
    if (x < 0 || x >= w || y < 0 || y >= h) return;
    float* p = img + (static_cast<size_t>(y) * w + x) * c;
    if (c == 1) {
        p[0] = 255.0f;
    } else {
        p[0] = static_cast<float>((color & 0xFF0000) >> 16);
        p[1] = static_cast<float>((color & 0x00FF00) >> 8);
        p[2] = static_cast<float>(color & 0x0000FF);
    }
}

void sift_draw_point(float* img, int w, int h, int c, int x, int y, int size,
                     int color) {
    for (int i = -size / 2; i <= size / 2; ++i)
        for (int j = -size / 2; j <= size / 2; ++j)
            set_rgb(img, w, h, c, x + i, y + j, color);
}

void sift_draw_line(float* img, int w, int h, int c, int x1, int y1, int x2,
                    int y2, int color, int thickness) {
    int dx = std::abs(x2 - x1), dy = std::abs(y2 - y1);
    int sx = x1 < x2 ? 1 : -1, sy = y1 < y2 ? 1 : -1;
    int err = dx - dy;
    for (;;) {
        sift_draw_point(img, w, h, c, x1, y1, thickness, color);
        if (x1 == x2 && y1 == y2) break;
        int e2 = 2 * err;
        if (e2 > -dy) {
            err -= dy;
            x1 += sx;
        }
        if (e2 < dx) {
            err += dx;
            y1 += sy;
        }
    }
}

void sift_draw_circle(float* img, int w, int h, int c, int x, int y,
                      int radius, int color, int thickness) {
    int x0 = radius, y0 = 0, err = 0;
    while (x0 >= y0) {
        sift_draw_point(img, w, h, c, x + x0, y + y0, thickness, color);
        sift_draw_point(img, w, h, c, x + y0, y + x0, thickness, color);
        sift_draw_point(img, w, h, c, x - y0, y + x0, thickness, color);
        sift_draw_point(img, w, h, c, x - x0, y + y0, thickness, color);
        sift_draw_point(img, w, h, c, x - x0, y - y0, thickness, color);
        sift_draw_point(img, w, h, c, x - y0, y - x0, thickness, color);
        sift_draw_point(img, w, h, c, x + y0, y - x0, thickness, color);
        sift_draw_point(img, w, h, c, x + x0, y - y0, thickness, color);
        if (err <= 0) {
            y0 += 1;
            err += 2 * y0 + 1;
        }
        if (err > 0) {
            x0 -= 1;
            err -= 2 * x0 + 1;
        }
    }
}

// Keypoint overlay (reference draw_keypoints, src/sift.cpp:821-844).
void sift_draw_keypoints(float* img, int w, int h, int c, const double* xs,
                         const double* ys, const int* layers,
                         const double* poris, int n, double scales_count) {
    static const int colors[7] = {0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00,
                                  0xFF00FF, 0x00FFFF, 0x000000};
    const double max_radius = 110.0, min_radius = 5.0;
    for (int i = 0; i < n; ++i) {
        int cx = static_cast<int>(xs[i]);
        int cy = static_cast<int>(ys[i]);
        int radius = static_cast<int>(
            min_radius * std::exp(layers[i] / (scales_count - 1) *
                                  std::log(max_radius / min_radius)));
        int color = colors[layers[i] % 7];
        sift_draw_circle(img, w, h, c, cx, cy, radius, color, 1);
        // Truncate the sum like the reference (src/sift.cpp:840-841).
        int x2 = static_cast<int>(xs[i] + radius * std::cos(poris[i]));
        int y2 = static_cast<int>(ys[i] + radius * std::sin(poris[i]));
        sift_draw_line(img, w, h, c, cx, cy, x2, y2, color, 1);
    }
}

// Vectorized glibc pow(2, x): the f64 parity profile recomputes keypoint
// sizes with the exact libm the reference binary linked (XLA's exp2 and
// numpy's SIMD pow both deviate by 1 ulp on a fraction of inputs; see
// models/sift._host_exact_sizes and src/sift.cpp:427-429).
void sift_pow2(const double* x, double* out, int n) {
    for (int i = 0; i < n; ++i) out[i] = pow(2.0, x[i]);
}

void sift_draw_match_lines(float* img, int w, int h, int c, const double* x1s,
                           const double* y1s, const double* x2s,
                           const double* y2s, int n, int x_offset, int color) {
    for (int i = 0; i < n; ++i) {
        sift_draw_line(img, w, h, c, static_cast<int>(x1s[i]),
                       static_cast<int>(y1s[i]),
                       x_offset + static_cast<int>(x2s[i]),
                       static_cast<int>(y2s[i]), color, 1);
    }
}

}  // extern "C"
