// Native data-loading core: threaded image decode (JPEG/PNG/WebP) + fused
// normalize/crop, exposed as a C ABI for ctypes.
//
// The reference pipeline leans on torch DataLoader's native worker pool
// (train_deeplab.py:58-73); this is the TPU framework's equivalent: decode and the
// per-pixel augmentation arithmetic run outside the Python GIL, so host-side input
// prep overlaps TPU compute. Formats cover the benchmark datasets exactly:
// RoadAnomaly/SMIYC .jpg, label .png, RoadObstacle21 .webp.
//
// Build: see native/Makefile (g++ -O3 -fPIC -shared, links libjpeg/libpng/libwebp).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>

extern "C" {

struct MssImage {
  uint8_t* data;  // HWC, row-major
  int h, w, c;
};

void mss_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

static int decode_jpeg(FILE* f, MssImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    // a corrupt stream can error AFTER the output buffer was allocated
    free(out->data);
    out->data = nullptr;
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  size_t stride = static_cast<size_t>(out->w) * 3;
  out->data = static_cast<uint8_t*>(malloc(stride * out->h));
  if (!out->data) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG (RGB for color images; single channel preserved for label maps)
// ---------------------------------------------------------------------------

static int decode_png(FILE* f, MssImage* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    free(out->data);
    out->data = nullptr;
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) {
    // Return palette INDICES, one channel — matching np.asarray(PIL mode "P")
    // in the Python fallback: paletted pngs are a common label-map encoding
    // where the index IS the class id; expanding to RGB destroys that.
    if (depth < 8) png_set_packing(png);
  } else {
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->h = h;
  out->w = w;
  out->c = channels;
  size_t stride = static_cast<size_t>(w) * channels;
  out->data = static_cast<uint8_t*>(malloc(stride * h));
  if (!out->data) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i) rows[i] = out->data + stride * i;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// WebP
// ---------------------------------------------------------------------------

static int decode_webp_buf(const uint8_t* buf, size_t len, MssImage* out) {
  int w, h;
  if (!WebPGetInfo(buf, len, &w, &h)) return -1;
  out->h = h;
  out->w = w;
  out->c = 3;
  out->data = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * 3));
  if (!out->data) return -1;
  if (!WebPDecodeRGBInto(buf, len, out->data, static_cast<size_t>(w) * h * 3, w * 3)) {
    free(out->data);
    out->data = nullptr;
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Dispatch by magic bytes
// ---------------------------------------------------------------------------

int mss_decode(const char* path, uint8_t** data, int* h, int* w, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[12] = {0};
  size_t got = fread(magic, 1, sizeof(magic), f);
  MssImage img{nullptr, 0, 0, 0};
  int rc = -1;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rewind(f);
    rc = decode_jpeg(f, &img);
  } else if (got >= 8 && magic[0] == 0x89 && magic[1] == 'P') {
    rewind(f);
    rc = decode_png(f, &img);
  } else if (got >= 12 && memcmp(magic, "RIFF", 4) == 0 &&
             memcmp(magic + 8, "WEBP", 4) == 0) {
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    rewind(f);
    std::vector<uint8_t> buf(len);
    if (fread(buf.data(), 1, len, f) == static_cast<size_t>(len)) {
      rc = decode_webp_buf(buf.data(), len, &img);
    }
  }
  fclose(f);
  if (rc != 0) return rc;
  *data = img.data;
  *h = img.h;
  *w = img.w;
  *c = img.c;
  return 0;
}

// Threaded batch decode: each image decoded on its own thread (the caller sizes
// batches to the host core count).
int mss_decode_batch(const char** paths, int n, uint8_t** datas, int* hs, int* ws,
                     int* cs) {
  std::vector<int> rcs(n, -1);
  std::vector<std::thread> threads;
  threads.reserve(n);
  for (int i = 0; i < n; ++i) {
    threads.emplace_back([&, i]() {
      rcs[i] = mss_decode(paths[i], &datas[i], &hs[i], &ws[i], &cs[i]);
    });
  }
  for (auto& t : threads) t.join();
  int bad = 0;
  for (int i = 0; i < n; ++i)
    if (rcs[i] != 0 && bad == 0) bad = -(i + 1);
  if (bad) {
    // free every successful decode before reporting failure: the caller falls
    // back to PIL for the whole batch and never sees these pointers
    for (int i = 0; i < n; ++i)
      if (rcs[i] == 0 && datas[i]) {
        free(datas[i]);
        datas[i] = nullptr;
      }
    return bad;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Fused uint8 -> normalized float32 with optional crop (the Normalize+crop hot
// path of the augmentation pipeline).
// ---------------------------------------------------------------------------

void mss_normalize_crop(const uint8_t* src, int h, int w, int top, int left,
                        int crop_h, int crop_w, const float* mean, const float* std,
                        float* dst) {
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  float scale[3] = {inv_std[0] / 255.0f, inv_std[1] / 255.0f, inv_std[2] / 255.0f};
  float bias[3] = {-mean[0] * inv_std[0], -mean[1] * inv_std[1], -mean[2] * inv_std[2]};
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* srow = src + (static_cast<size_t>(top + y) * w + left) * 3;
    float* drow = dst + static_cast<size_t>(y) * crop_w * 3;
    for (int x = 0; x < crop_w * 3; x += 3) {
      drow[x + 0] = srow[x + 0] * scale[0] + bias[0];
      drow[x + 1] = srow[x + 1] * scale[1] + bias[1];
      drow[x + 2] = srow[x + 2] * scale[2] + bias[2];
    }
  }
}

// Mixup blend of two uint8 images: out = p * a + (1 - p) * b
// (reference cityscapes.py:160-163).
void mss_mixup(const uint8_t* a, const uint8_t* b, float p, int n, uint8_t* out) {
  float q = 1.0f - p;
  for (int i = 0; i < n; ++i) {
    out[i] = static_cast<uint8_t>(p * a[i] + q * b[i] + 0.5f);
  }
}

}  // extern "C"
