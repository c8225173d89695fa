// tapclip_tpu native image pipeline.
//
// The reference delegates image IO to torchvision/PIL through Python
// (/root/reference/dataset.py:31, preprocess from open_clip). Sustained
// TPU prompt-tuning throughput (>=2k images/sec/chip, BASELINE.json) makes
// the host decode path the bottleneck; this library provides a C++ pipeline:
//   JPEG/PNG decode -> RGB -> PIL-compatible antialiased bicubic resize
//   (shorter side) -> center crop -> optional CLIP normalize,
// with an internal pthread pool for batch decoding. Exposed via a plain C ABI
// consumed through ctypes (no pybind11 dependency in this environment).
//
// Resampling matches Pillow's ImagingResample semantics (bicubic a=-0.5,
// filter support scaled by the downscale ratio) so outputs agree with the
// PIL path within rounding.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>
#include <vector>
#include <string>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  std::vector<unsigned char> rgb;  // h*w*3
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// fast_target > 0 enables DCT-domain downscaling (PIL Image.draft
// semantics): the IDCT emits at 1/2, 1/4 or 1/8 scale, chosen as the
// largest factor that keeps the decoded short side >= fast_target so the
// bicubic resample still only ever downscales.  This skips most of the
// IDCT + colorspace work for large sources but changes the pixels feeding
// the resample — it is an OPT-IN throughput mode, never the default
// (the default path stays bit-exact with PIL).
bool decode_jpeg(const unsigned char* data, size_t len, Image* out,
                 int fast_target = 0) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  if (fast_target > 0) {
    const long min_dim = std::min<long>(cinfo.image_width, cinfo.image_height);
    // 1/2, 1/4, 1/8 are supported by both classic libjpeg and libjpeg-turbo.
    int denom = 1;
    for (int d = 8; d > 1; d /= 2) {
      if (min_dim >= long(fast_target) * d) { denom = d; break; }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const unsigned char* data;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) png_error(png, "eof");
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const unsigned char* data, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{data, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_buffer(const unsigned char* data, size_t len, Image* out,
                   int fast_target = 0) {
  if (len > 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, out, fast_target);
  if (decode_png(data, len, out)) return true;
  return decode_jpeg(data, len, out, fast_target);  // fall back to jpeg
}

bool decode_file(const char* path, Image* out, int fast_target = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) { fclose(f); return false; }
  std::vector<unsigned char> buf(len);
  size_t rd = fread(buf.data(), 1, len, f);
  fclose(f);
  if (rd != size_t(len)) return false;
  return decode_buffer(buf.data(), len, out, fast_target);
}

// ---------------------------------------------------------------------------
// PIL-compatible bicubic resampling (Pillow ImagingResample, a = -0.5)
// ---------------------------------------------------------------------------

inline double bicubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

constexpr double kBicubicSupport = 2.0;

// Precompute per-output-pixel contribution bounds + normalized weights.
void precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                       std::vector<double>* weights, int* ksize_out) {
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = kBicubicSupport * filterscale;
  int ksize = int(std::ceil(support)) * 2 + 1;
  bounds->resize(size_t(out_size) * 2);
  weights->assign(size_t(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double* w = weights->data() + size_t(xx) * ksize;
    double wsum = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double ww = bicubic_filter((x - center + 0.5) / filterscale);
      w[x - xmin] = ww;
      wsum += ww;
    }
    if (wsum != 0.0)
      for (int i = 0; i < xmax - xmin; ++i) w[i] /= wsum;
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax - xmin;
  }
  *ksize_out = ksize;
}

// Pillow's 8bpc fixed-point path (Resample.c): coefficients are scaled to
// int32 with PRECISION_BITS and the intermediate image is quantized back to
// uint8 after the horizontal pass — reproducing this exactly is what makes
// the native pipeline bit-identical to the PIL reference path.
constexpr int kPrecisionBits = 32 - 8 - 2;

inline unsigned char clip8(int in) {
  if (in >= (255 << kPrecisionBits)) return 255;
  if (in <= 0) return 0;
  return (unsigned char)(in >> kPrecisionBits);
}

void quantize_coeffs(const std::vector<double>& w, std::vector<int>* kk) {
  kk->resize(w.size());
  for (size_t i = 0; i < w.size(); ++i) {
    double v = w[i] * (1 << kPrecisionBits);
    (*kk)[i] = int(v < 0 ? v - 0.5 : v + 0.5);
  }
}

// Separable resize, exact Pillow semantics: horizontal -> uint8 -> vertical.
// Resample to (out_w, out_h) but emit ONLY the crop window
// [x0, x0+crop_w) x [y0, y0+crop_h) — bit-identical to resize-then-slice
// (coefficients are per-output-position, so computing a subset changes
// nothing), and the cropped-away columns/rows are never computed.
void resize_bicubic_cropped(const Image& in, int out_w, int out_h, int x0,
                            int y0, int crop_w, int crop_h,
                            std::vector<unsigned char>* out) {
  std::vector<int> hb, vb;
  std::vector<double> hw_d, vw_d;
  int hks, vks;
  precompute_coeffs(in.w, out_w, &hb, &hw_d, &hks);
  precompute_coeffs(in.h, out_h, &vb, &vw_d, &vks);
  std::vector<int> hw, vw;
  quantize_coeffs(hw_d, &hw);
  quantize_coeffs(vw_d, &vw);

  const int half = 1 << (kPrecisionBits - 1);

  // Only source rows feeding the cropped vertical range are resampled
  // horizontally (uint8 intermediate, like Pillow).
  int ysrc_min = vb[size_t(y0) * 2];
  int ylast = y0 + crop_h - 1;
  int ysrc_max = vb[size_t(ylast) * 2] + vb[size_t(ylast) * 2 + 1];
  std::vector<unsigned char> tmp(size_t(ysrc_max - ysrc_min) * crop_w * 3);
  for (int y = ysrc_min; y < ysrc_max; ++y) {
    const unsigned char* row = in.rgb.data() + size_t(y) * in.w * 3;
    unsigned char* trow = tmp.data() + size_t(y - ysrc_min) * crop_w * 3;
    for (int xc = 0; xc < crop_w; ++xc) {
      int xx = x0 + xc;
      int xmin = hb[size_t(xx) * 2], n = hb[size_t(xx) * 2 + 1];
      const int* k = hw.data() + size_t(xx) * hks;
      int acc0 = half, acc1 = half, acc2 = half;
      for (int i = 0; i < n; ++i) {
        const unsigned char* px = row + size_t(xmin + i) * 3;
        acc0 += k[i] * px[0];
        acc1 += k[i] * px[1];
        acc2 += k[i] * px[2];
      }
      trow[xc * 3 + 0] = clip8(acc0);
      trow[xc * 3 + 1] = clip8(acc1);
      trow[xc * 3 + 2] = clip8(acc2);
    }
  }
  // vertical pass over the cropped rows only
  out->resize(size_t(crop_h) * crop_w * 3);
  for (int yc = 0; yc < crop_h; ++yc) {
    int yy = y0 + yc;
    int ymin = vb[size_t(yy) * 2] - ysrc_min, n = vb[size_t(yy) * 2 + 1];
    const int* k = vw.data() + size_t(yy) * vks;
    unsigned char* orow = out->data() + size_t(yc) * crop_w * 3;
    for (int xx = 0; xx < crop_w * 3; ++xx) {
      int acc = half;
      for (int i = 0; i < n; ++i)
        acc += k[i] * tmp[size_t(ymin + i) * crop_w * 3 + xx];
      orow[xx] = clip8(acc);
    }
  }
}

void resize_bicubic(const Image& in, int out_w, int out_h,
                    std::vector<unsigned char>* out /* out_h*out_w*3 */) {
  resize_bicubic_cropped(in, out_w, out_h, 0, 0, out_w, out_h, out);
}

// CLIP normalization constants (config.py IMAGE_MEAN/IMAGE_STD).
constexpr float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

inline float clamp255(float v) { return v < 0.f ? 0.f : (v > 255.f ? 255.f : v); }

// Shared resize+crop geometry — the ROUNDING-CRITICAL piece both output
// dtypes must agree on (CLAUDE.md: bit-exact with PIL, don't "fix" it):
// shorter side -> out_size with the long side TRUNCATED like torchvision's
// _compute_resized_output_size (int(size * long / short)); center crop via
// Python round() = round-half-EVEN semantics (std::nearbyint under the
// default FE_TONEAREST mode — lround would shift half-cases by one). The
// crop window is fused INTO the resample (cropped-away rows/cols never
// computed).
bool resample_center_crop(Image& img, int out_size,
                          std::vector<unsigned char>* resized) {
  if (img.w <= 0 || img.h <= 0) return false;
  int rw, rh;
  if (img.w <= img.h) {
    rw = out_size;
    rh = std::max(1, int(double(out_size) * img.h / img.w));
  } else {
    rh = out_size;
    rw = std::max(1, int(double(out_size) * img.w / img.h));
  }
  int left = int(std::nearbyint((rw - out_size) / 2.0));
  int top = int(std::nearbyint((rh - out_size) / 2.0));
  resize_bicubic_cropped(img, rw, rh, left, top, out_size, out_size, resized);
  return true;
}

// Full per-image pipeline into out[out_size*out_size*3].
bool process_image(Image& img, int out_size, int do_normalize, float* out) {
  std::vector<unsigned char> resized;
  if (!resample_center_crop(img, out_size, &resized)) return false;
  for (int y = 0; y < out_size; ++y) {
    const unsigned char* src = resized.data() + size_t(y) * out_size * 3;
    float* dst = out + size_t(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = src[x * 3 + c] / 255.0f;
        dst[x * 3 + c] = do_normalize ? (v - kMean[c]) / kStd[c] : v;
      }
    }
  }
  return true;
}

bool process_one(const char* path, int out_size, int do_normalize, float* out,
                 int fast_target = 0) {
  Image img;
  if (!decode_file(path, &img, fast_target)) return false;
  return process_image(img, out_size, do_normalize, out);
}

bool process_bytes(const unsigned char* data, size_t len, int out_size,
                   int do_normalize, float* out, int fast_target = 0) {
  Image img;
  if (!decode_buffer(data, len, &img, fast_target)) return false;
  return process_image(img, out_size, do_normalize, out);
}

// uint8 output: the resample already produces uint8 rows, so this is the
// crop-window copy with no float conversion at all — bit-identical to
// quantizing the float path's unnormalized output (whose values are exactly
// k/255).  Normalization happens on device (preprocess.device_normalize).
// Geometry is the SAME resample_center_crop the float path uses.
bool process_image_u8(Image& img, int out_size, unsigned char* out) {
  std::vector<unsigned char> resized;
  if (!resample_center_crop(img, out_size, &resized)) return false;
  memcpy(out, resized.data(), resized.size());
  return true;
}

bool process_one_u8(const char* path, int out_size, unsigned char* out,
                    int fast_target) {
  Image img;
  if (!decode_file(path, &img, fast_target)) return false;
  return process_image_u8(img, out_size, out);
}

bool process_bytes_u8(const unsigned char* data, size_t len, int out_size,
                      unsigned char* out, int fast_target) {
  Image img;
  if (!decode_buffer(data, len, &img, fast_target)) return false;
  return process_image_u8(img, out_size, out);
}

// ---------------------------------------------------------------------------
// Thread pool over a batch
// ---------------------------------------------------------------------------

struct BatchJob {
  const char** paths;           // path mode
  const unsigned char** datas;  // bytes mode (paths == nullptr)
  const size_t* lens;
  int n, out_size, do_normalize;
  int fast_target = 0;  // 0 = exact decode; >0 = DCT-scaled fast path
  float* out = nullptr;            // float mode
  unsigned char* out_u8 = nullptr;  // uint8 mode (out == nullptr)
  unsigned char* ok;
  int next = 0;
  pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
};

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  const size_t stride = size_t(job->out_size) * job->out_size * 3;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->n) break;
    bool good;
    if (job->out_u8) {
      good = job->paths
                 ? process_one_u8(job->paths[i], job->out_size,
                                  job->out_u8 + stride * i, job->fast_target)
                 : process_bytes_u8(job->datas[i], job->lens[i], job->out_size,
                                    job->out_u8 + stride * i,
                                    job->fast_target);
    } else {
      good = job->paths
                 ? process_one(job->paths[i], job->out_size,
                               job->do_normalize, job->out + stride * i,
                               job->fast_target)
                 : process_bytes(job->datas[i], job->lens[i], job->out_size,
                                 job->do_normalize, job->out + stride * i,
                                 job->fast_target);
    }
    job->ok[i] = good ? 1 : 0;
  }
  return nullptr;
}

int run_batch(BatchJob* job, int num_threads) {
  int nt = std::max(1, std::min(num_threads, job->n));
  std::vector<pthread_t> threads(nt > 1 ? nt - 1 : 0);
  for (auto& t : threads) pthread_create(&t, nullptr, batch_worker, job);
  batch_worker(job);
  for (auto& t : threads) pthread_join(t, nullptr);
  int good = 0;
  for (int i = 0; i < job->n; ++i) good += job->ok[i];
  return good;
}

}  // namespace

extern "C" {

// Decode+preprocess a batch of image files into out (n*size*size*3 float32,
// NHWC). ok[i]=1 on success. Returns number of successes.
// fast_dct_scale != 0 enables the opt-in DCT-scaled JPEG decode (see
// decode_jpeg): NOT bit-exact with PIL, ~pixel-identical after the resample.
int tapclip_decode_batch_ex(const char** paths, int n, int out_size,
                            int do_normalize, int fast_dct_scale,
                            int num_threads, float* out, unsigned char* ok) {
  BatchJob job;
  job.paths = paths;
  job.datas = nullptr;
  job.lens = nullptr;
  job.n = n;
  job.out_size = out_size;
  job.do_normalize = do_normalize;
  job.fast_target = fast_dct_scale ? out_size : 0;
  job.out = out;
  job.ok = ok;
  return run_batch(&job, num_threads);
}

int tapclip_decode_batch(const char** paths, int n, int out_size,
                         int do_normalize, int num_threads, float* out,
                         unsigned char* ok) {
  return tapclip_decode_batch_ex(paths, n, out_size, do_normalize, 0,
                                 num_threads, out, ok);
}

// Same, but from in-memory encoded buffers (webdataset/CSV streaming: the
// bytes never touch the filesystem).
int tapclip_decode_bytes_batch_ex(const unsigned char** datas,
                                  const size_t* lens, int n, int out_size,
                                  int do_normalize, int fast_dct_scale,
                                  int num_threads, float* out,
                                  unsigned char* ok) {
  BatchJob job;
  job.paths = nullptr;
  job.datas = datas;
  job.lens = lens;
  job.n = n;
  job.out_size = out_size;
  job.do_normalize = do_normalize;
  job.fast_target = fast_dct_scale ? out_size : 0;
  job.out = out;
  job.ok = ok;
  return run_batch(&job, num_threads);
}

int tapclip_decode_bytes_batch(const unsigned char** datas, const size_t* lens,
                               int n, int out_size, int do_normalize,
                               int num_threads, float* out,
                               unsigned char* ok) {
  return tapclip_decode_bytes_batch_ex(datas, lens, n, out_size, do_normalize,
                                       0, num_threads, out, ok);
}

// uint8 output variants: no normalization (it fuses on device), no float
// conversion — the output rows are the resample's uint8 bytes directly.
int tapclip_decode_batch_u8(const char** paths, int n, int out_size,
                            int fast_dct_scale, int num_threads,
                            unsigned char* out, unsigned char* ok) {
  BatchJob job;
  job.paths = paths;
  job.datas = nullptr;
  job.lens = nullptr;
  job.n = n;
  job.out_size = out_size;
  job.do_normalize = 0;
  job.fast_target = fast_dct_scale ? out_size : 0;
  job.out_u8 = out;
  job.ok = ok;
  return run_batch(&job, num_threads);
}

int tapclip_decode_bytes_batch_u8(const unsigned char** datas,
                                  const size_t* lens, int n, int out_size,
                                  int fast_dct_scale, int num_threads,
                                  unsigned char* out, unsigned char* ok) {
  BatchJob job;
  job.paths = nullptr;
  job.datas = datas;
  job.lens = lens;
  job.n = n;
  job.out_size = out_size;
  job.do_normalize = 0;
  job.fast_target = fast_dct_scale ? out_size : 0;
  job.out_u8 = out;
  job.ok = ok;
  return run_batch(&job, num_threads);
}

// Single-image variant (testing / simple callers).
int tapclip_decode_one(const char* path, int out_size, int do_normalize,
                       float* out) {
  return process_one(path, out_size, do_normalize, out) ? 1 : 0;
}

int tapclip_abi_version() { return 4; }

}  // extern "C"
