// cfen_loader — native image decode + normalize for the data pipeline.
//
// TPU-native counterpart of the reference's native layer: the reference's
// only non-Python code is the dcn CUDA extension (dcn/src/, handled by
// ops/deform_conv.py on the compute side); its data path is PIL inside
// torch DataLoader worker *processes* (data/__init__.py:41-48).  Here the
// host-side hot path — JPEG/PNG decode + [-1,1] float32 normalization for
// fixed-size eval batches — runs in native threads (libjpeg/libpng release
// no GIL at all), feeding the device without Python in the loop.
//
// C ABI (ctypes):
//   cfen_decode_rgb(path, out_u8, &w, &h)            single image probe
//   cfen_decode_batch_f32(paths, n, out_f32, H, W, threads)
//       decodes n images, verifies each is exactly HxW, writes NHWC
//       float32 in [-1, 1] ((v/255)*2-1, matching torchvision
//       ToTensor+Normalize(0.5,0.5), ref data/base_dataset.py:44-46).
//       returns 0 on success, -(i+1) if image i failed.
//
// Build: make -C runtime   (links -ljpeg -lpng -lz)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// A few-KB JPEG can declare 65500x65500 (12.8 GB RGB): cap dimensions and
// check malloc so a hostile header can't drive writes through a null
// pointer (advisor r2).  64 MPix = 192 MB RGB, far above any real request.
constexpr long long kMaxPixels = 64LL * 1024 * 1024;

unsigned char* alloc_rgb(int w, int h) {
    if (w <= 0 || h <= 0 || static_cast<long long>(w) * h > kMaxPixels)
        return nullptr;
    return static_cast<unsigned char*>(malloc(size_t(w) * h * 3));
}

// Decode a baseline/progressive JPEG to RGB8. Returns malloc'd buffer.
unsigned char* decode_jpeg(FILE* f, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    unsigned char* buf = nullptr;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        free(buf);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    buf = alloc_rgb(*w, *h);
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = buf + size_t(cinfo.output_scanline) * *w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return buf;
}

// Decode any PNG to RGB8 (palette/gray/alpha normalized to RGB).
unsigned char* decode_png(FILE* f, int* w, int* h) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return nullptr;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return nullptr;
    }
    unsigned char* buf = nullptr;
    std::vector<png_bytep> rows;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        free(buf);
        return nullptr;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_set_expand(png);            // palette/gray<8/tRNS -> 8-bit
    png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    buf = alloc_rgb(*w, *h);
    if (!buf) {
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    rows.resize(*h);
    for (int y = 0; y < *h; ++y) rows[y] = buf + size_t(y) * *w * 3;
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    return buf;
}

unsigned char* decode_any(const char* path, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    unsigned char magic[8] = {0};
    size_t got = fread(magic, 1, 8, f);
    rewind(f);
    unsigned char* buf = nullptr;
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        buf = decode_jpeg(f, w, h);
    } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
        buf = decode_png(f, w, h);
    }
    fclose(f);
    return buf;
}

}  // namespace

extern "C" {

int cfen_decode_rgb(const char* path, unsigned char* out, int* w, int* h) {
    int iw = 0, ih = 0;
    unsigned char* buf = decode_any(path, &iw, &ih);
    if (!buf) return -1;
    if (out) memcpy(out, buf, size_t(iw) * ih * 3);
    *w = iw;
    *h = ih;
    free(buf);
    return 0;
}

int cfen_image_size(const char* path, int* w, int* h) {
    // cheap full decode for simplicity; callers use it only for probing
    return cfen_decode_rgb(path, nullptr, w, h);
}

int cfen_decode_batch_f32(const char** paths, int n, float* out,
                          int H, int W, int threads) {
    if (threads < 1) threads = 1;
    std::atomic<int> next(0);
    std::atomic<int> status(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n || status.load() != 0) return;
            int w = 0, h = 0;
            unsigned char* buf = decode_any(paths[i], &w, &h);
            if (!buf || w != W || h != H) {
                free(buf);
                int expect = 0;
                status.compare_exchange_strong(expect, -(i + 1));
                return;
            }
            const size_t px = size_t(H) * W * 3;
            float* dst = out + size_t(i) * px;
            for (size_t j = 0; j < px; ++j) {
                dst[j] = float(buf[j]) * (2.0f / 255.0f) - 1.0f;
            }
            free(buf);
        }
    };
    std::vector<std::thread> pool;
    int nt = threads < n ? threads : n;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return status.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PNG encode (RGB8) — host-side output path for test.py/serve.py galleries.
// compress_level 0-9 (1 = fast, the eval-pipeline default).

extern "C" int cfen_encode_png(const char* path, const unsigned char* rgb,
                               int W, int H, int compress_level) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    if (!png) { fclose(f); return -2; }
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_write_struct(&png, nullptr); fclose(f); return -2; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        fclose(f);
        return -3;
    }
    png_init_io(png, f);
    png_set_compression_level(png, compress_level);
    png_set_IHDR(png, info, W, H, 8, PNG_COLOR_TYPE_RGB,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; ++y)
        rows[y] = const_cast<png_bytep>(rgb + size_t(y) * W * 3);
    png_write_image(png, rows.data());
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// In-memory codecs for the serving path (serve.py): decode request bytes,
// encode response bytes, no filesystem round-trip.  Buffers returned here
// are malloc'd; the caller releases them with cfen_free.

extern "C" void cfen_free(void* p) { free(p); }

namespace {

struct PngMemReader {
    const unsigned char* data;
    size_t len;
    size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    PngMemReader* r = static_cast<PngMemReader*>(png_get_io_ptr(png));
    if (r->pos + n > r->len) png_error(png, "read past end");
    memcpy(out, r->data + r->pos, n);
    r->pos += n;
}

struct PngMemWriter {
    unsigned char* data;
    size_t len;
    size_t cap;
};

void png_mem_write(png_structp png, png_bytep in, png_size_t n) {
    PngMemWriter* wtr = static_cast<PngMemWriter*>(png_get_io_ptr(png));
    if (wtr->len + n > wtr->cap) {
        size_t cap = wtr->cap ? wtr->cap * 2 : 65536;
        while (cap < wtr->len + n) cap *= 2;
        unsigned char* grown =
            static_cast<unsigned char*>(realloc(wtr->data, cap));
        if (!grown) {  // old block still valid: free it, then longjmp out
            free(wtr->data);
            wtr->data = nullptr;
            wtr->cap = wtr->len = 0;
            png_error(png, "png_mem_write: out of memory");
        }
        wtr->data = grown;
        wtr->cap = cap;
    }
    memcpy(wtr->data + wtr->len, in, n);
    wtr->len += n;
}

void png_mem_flush(png_structp) {}

}  // namespace

// Decode JPEG/PNG from memory to RGB8. Returns malloc'd buffer (caller
// frees with cfen_free) or nullptr.
extern "C" unsigned char* cfen_decode_rgb_mem(const unsigned char* data,
                                              size_t len, int* w, int* h) {
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
        jpeg_decompress_struct cinfo;
        JpegErr jerr;
        cinfo.err = jpeg_std_error(&jerr.pub);
        jerr.pub.error_exit = jpeg_err_exit;
        unsigned char* buf = nullptr;
        if (setjmp(jerr.jump)) {
            jpeg_destroy_decompress(&cinfo);
            free(buf);
            return nullptr;
        }
        jpeg_create_decompress(&cinfo);
        jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                     static_cast<unsigned long>(len));
        jpeg_read_header(&cinfo, TRUE);
        cinfo.out_color_space = JCS_RGB;
        jpeg_start_decompress(&cinfo);
        *w = cinfo.output_width;
        *h = cinfo.output_height;
        buf = alloc_rgb(*w, *h);
        if (!buf) {
            jpeg_destroy_decompress(&cinfo);
            return nullptr;
        }
        while (cinfo.output_scanline < cinfo.output_height) {
            unsigned char* row = buf + size_t(cinfo.output_scanline) * *w * 3;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return buf;
    }
    if (len >= 8 && png_sig_cmp(const_cast<png_bytep>(data), 0, 8) == 0) {
        png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                                 nullptr, nullptr, nullptr);
        if (!png) return nullptr;
        png_infop info = png_create_info_struct(png);
        if (!info) {
            png_destroy_read_struct(&png, nullptr, nullptr);
            return nullptr;
        }
        unsigned char* buf = nullptr;
        std::vector<png_bytep> rows;
        PngMemReader reader{data, len, 0};
        if (setjmp(png_jmpbuf(png))) {
            png_destroy_read_struct(&png, &info, nullptr);
            free(buf);
            return nullptr;
        }
        png_set_read_fn(png, &reader, png_mem_read);
        png_read_info(png, info);
        png_set_expand(png);
        png_set_strip_16(png);
        png_set_strip_alpha(png);
        png_set_gray_to_rgb(png);
        png_read_update_info(png, info);
        *w = png_get_image_width(png, info);
        *h = png_get_image_height(png, info);
        buf = alloc_rgb(*w, *h);
        if (!buf) {
            png_destroy_read_struct(&png, &info, nullptr);
            return nullptr;
        }
        rows.resize(*h);
        for (int y = 0; y < *h; ++y) rows[y] = buf + size_t(y) * *w * 3;
        png_read_image(png, rows.data());
        png_read_end(png, nullptr);
        png_destroy_read_struct(&png, &info, nullptr);
        return buf;
    }
    return nullptr;
}

// Encode RGB8 to an in-memory PNG. Returns malloc'd buffer + *out_len, or
// nullptr.  compress_level 1 = fast (the serving default).
extern "C" unsigned char* cfen_encode_png_mem(const unsigned char* rgb,
                                              int W, int H,
                                              int compress_level,
                                              size_t* out_len) {
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    if (!png) return nullptr;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_write_struct(&png, nullptr);
        return nullptr;
    }
    PngMemWriter wtr{nullptr, 0, 0};
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        free(wtr.data);
        return nullptr;
    }
    png_set_write_fn(png, &wtr, png_mem_write, png_mem_flush);
    png_set_compression_level(png, compress_level);
    png_set_IHDR(png, info, W, H, 8, PNG_COLOR_TYPE_RGB,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; ++y)
        rows[y] = const_cast<png_bytep>(rgb + size_t(y) * W * 3);
    png_write_image(png, rows.data());
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    *out_len = wtr.len;
    return wtr.data;
}
