// Native image-decode + transform pipeline for the TPU input path.
//
// The reference feeds its GPU from torchvision/PIL inside DataLoader worker
// processes (src/data/load_data_local.py:99-104).  On TPU the input pipeline
// is the throughput risk (SURVEY.md §7: "keeping a v5e fed ... is the real
// throughput risk"), so the hot path — JPEG/PNG decode, shorter-side resize,
// center crop, bilinear resize, [-1,1] float normalize — is native C++
// (libjpeg/libpng), called via ctypes from a thread pool: ctypes releases
// the GIL, so N decode threads run truly in parallel.
//
// C ABI (all return 0 on success):
//   ddpm_decode_image_file(path, init_resize, crop, out_size, float* out)
//   ddpm_decode_image_bytes(bytes, len, init_resize, crop, out_size, float* out)
//   out buffer: out_size*out_size*3 floats, HWC, [-1, 1].
//   init_resize <= 0: skip shorter-side resize. crop <= 0: skip center crop.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cstdint>
#include <vector>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------- JPEG ----------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep dst, png_size_t n) {
  PngReadState* s = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "read past end");
  }
  std::memcpy(dst, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // drop alpha
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  else if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------- transforms ----------------

// PIL-compatible bilinear resample: separable triangle filter whose support
// scales with the downsampling ratio (antialiased), half-pixel centers.
// Matches PIL.Image.resize(..., BILINEAR) to ~1/255 — required so the native
// path is a drop-in for the reference transform chain.
struct FilterTaps {
  std::vector<int> bounds;     // (xmin, size) per output pixel
  std::vector<float> weights;  // ksize per output pixel
  int ksize = 0;
};

FilterTaps build_taps(int in_size, int out_size) {
  FilterTaps t;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle filter support
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.bounds.resize(size_t(out_size) * 2);
  t.weights.resize(size_t(out_size) * t.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(std::max(0.0, std::floor(center - support)));
    int xmax = int(std::min(double(in_size), std::ceil(center + support)));
    int size = xmax - xmin;
    double ss = 0.0;
    float* w = &t.weights[size_t(xx) * t.ksize];
    for (int x = 0; x < size; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double val = (arg < 0 ? -arg : arg) < 1.0 ? 1.0 - std::abs(arg) : 0.0;
      w[x] = float(val);
      ss += val;
    }
    if (ss != 0.0) {
      for (int x = 0; x < size; ++x) w[x] = float(w[x] / ss);
    }
    t.bounds[size_t(xx) * 2] = xmin;
    t.bounds[size_t(xx) * 2 + 1] = size;
  }
  return t;
}

void resize_bilinear(const Image& src, int out_w, int out_h, Image* dst) {
  // horizontal pass into float intermediate, then vertical pass
  FilterTaps tx = build_taps(src.w, out_w);
  FilterTaps ty = build_taps(src.h, out_h);

  std::vector<float> mid(size_t(src.h) * out_w * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = &src.rgb[size_t(y) * src.w * 3];
    float* orow = &mid[size_t(y) * out_w * 3];
    for (int x = 0; x < out_w; ++x) {
      int xmin = tx.bounds[size_t(x) * 2];
      int size = tx.bounds[size_t(x) * 2 + 1];
      const float* w = &tx.weights[size_t(x) * tx.ksize];
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < size; ++k) {
        const uint8_t* p = &row[(size_t(xmin) + k) * 3];
        acc[0] += p[0] * w[k];
        acc[1] += p[1] * w[k];
        acc[2] += p[2] * w[k];
      }
      orow[x * 3 + 0] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }

  dst->w = out_w;
  dst->h = out_h;
  dst->rgb.resize(size_t(out_w) * out_h * 3);
  for (int y = 0; y < out_h; ++y) {
    int ymin = ty.bounds[size_t(y) * 2];
    int size = ty.bounds[size_t(y) * 2 + 1];
    const float* w = &ty.weights[size_t(y) * ty.ksize];
    uint8_t* orow = &dst->rgb[size_t(y) * out_w * 3];
    for (int x = 0; x < out_w; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < size; ++k) {
        const float* p = &mid[(size_t(ymin + k) * out_w + x) * 3];
        acc[0] += p[0] * w[k];
        acc[1] += p[1] * w[k];
        acc[2] += p[2] * w[k];
      }
      for (int c = 0; c < 3; ++c) {
        orow[x * 3 + c] =
            uint8_t(std::min(255.f, std::max(0.f, acc[c] + 0.5f)));
      }
    }
  }
}

void center_crop(const Image& src, int size, Image* dst) {
  int cw = std::min(size, src.w);
  int ch = std::min(size, src.h);
  int left = (src.w - cw) / 2;
  int top = (src.h - ch) / 2;
  dst->w = cw;
  dst->h = ch;
  dst->rgb.resize(size_t(cw) * ch * 3);
  for (int y = 0; y < ch; ++y) {
    std::memcpy(dst->rgb.data() + size_t(y) * cw * 3,
                src.rgb.data() + (size_t(y + top) * src.w + left) * 3,
                size_t(cw) * 3);
  }
}

int transform_to(const Image& decoded, int init_resize, int crop, int out_size,
                 float* out) {
  Image tmp1, tmp2, tmp3;
  const Image* cur = &decoded;

  if (init_resize > 0 && std::min(cur->w, cur->h) != init_resize) {
    // shorter side -> init_resize, keep aspect (PIL-compatible rounding)
    int nw, nh;
    if (cur->w < cur->h) {
      nw = init_resize;
      nh = int(double(cur->h) * init_resize / cur->w);
    } else {
      nh = init_resize;
      nw = int(double(cur->w) * init_resize / cur->h);
    }
    resize_bilinear(*cur, nw, nh, &tmp1);
    cur = &tmp1;
  }
  if (crop > 0) {
    center_crop(*cur, crop, &tmp2);
    cur = &tmp2;
  }
  if (cur->w != out_size || cur->h != out_size) {
    resize_bilinear(*cur, out_size, out_size, &tmp3);
    cur = &tmp3;
  }
  const size_t n = size_t(out_size) * out_size * 3;
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) {
    out[i] = cur->rgb[i] * inv * 2.0f - 1.0f;
  }
  return 0;
}

bool decode_any(const uint8_t* data, size_t len, Image* img) {
  if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8) return decode_jpeg(data, len, img);
  if (len >= 8 && !png_sig_cmp(data, 0, 8)) return decode_png(data, len, img);
  // fall through: try both
  if (decode_jpeg(data, len, img)) return true;
  return decode_png(data, len, img);
}

}  // namespace

extern "C" {

int ddpm_decode_image_bytes(const uint8_t* data, size_t len, int init_resize,
                            int crop, int out_size, float* out) {
  Image img;
  if (!decode_any(data, len, &img)) return 1;
  if (img.w <= 0 || img.h <= 0) return 2;
  return transform_to(img, init_resize, crop, out_size, out);
}

int ddpm_decode_image_file(const char* path, int init_resize, int crop,
                           int out_size, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 3;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    std::fclose(f);
    return 4;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  size_t got = std::fread(buf.data(), 1, size_t(sz), f);
  std::fclose(f);
  if (got != size_t(sz)) return 5;
  return ddpm_decode_image_bytes(buf.data(), buf.size(), init_resize, crop,
                                 out_size, out);
}

int ddpm_pipeline_version() { return 1; }

}  // extern "C"
