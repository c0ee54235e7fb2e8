// Native image IO for the streaming data path.
//
// The reference framework leans on OpenCV's imread on a multi-core host
// (ViPT/lib/train/dataset/depth_utils.py get_rgbd_frame); here ONE host
// core feeds the TPU, so every extra pass over a decoded frame costs
// throughput. This library fuses the per-frame host work into single
// passes with zero intermediate copies:
//
//   * JPEG -> RGB decoded straight into the caller's staging slice
//     (libjpeg emits RGB natively; the cv2 path decodes BGR and pays an
//     extra full-frame cvtColor + copy).
//   * 16-bit PNG depth -> the 1-byte JET LUT index plane
//     (data/composition.py::depth_index_u8 semantics: clip at
//     min(3*median, 10000), NORM_MINMAX to u8 with round-half-even),
//     computed from a 65536-bin histogram built during row decode.
//
// Called via ctypes (mmtrack_tpu/data/native_io.py) which releases the
// GIL, so a Python decode thread genuinely overlaps the main thread's
// dispatch work even on one core. numpy/cv2 fallbacks keep every caller
// functional without the toolchain (same output, bit-for-bit).

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

struct MemReader {
  const unsigned char* data;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) {
    png_error(png, "eof");
    return;
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

unsigned char* read_file(const char* path, long* out_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  unsigned char* buf = static_cast<unsigned char*>(std::malloc(len));
  if (!buf || std::fread(buf, 1, len, f) != static_cast<size_t>(len)) {
    std::free(buf);
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  *out_len = len;
  return buf;
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer to tightly-packed RGB rows in `out`
// (capacity must be >= H*W*3 for the encoded dims). Returns 0 on success
// and fills *h/*w; -1 decode error; -2 dims exceed max_h/max_w.
int mmt_decode_jpeg_rgb(const unsigned char* buf, long len,
                        unsigned char* out, int max_h, int max_w,
                        int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale sources upconvert too
  jpeg_start_decompress(&cinfo);
  int H = cinfo.output_height, W = cinfo.output_width;
  if (H > max_h || W > max_w) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *h = H;
  *w = W;
  return 0;
}

// Decode a PNG byte buffer to native-endian uint16 grayscale in `out`
// (8-bit sources are widened by <<8? no — scaled 8->16 via replication is
// NOT what cv2 does: cv2.imread(..., -1) returns 8-bit arrays as uint8.
// For the depth path all real sources are 16-bit; 8-bit inputs are
// returned as their raw value so callers see the same numbers cv2 gives
// after .astype(np.uint16)). Returns 0 on success; -1 error; -2 too big.
int mmt_decode_png_u16(const unsigned char* buf, long len,
                       unsigned short* out, int max_h, int max_w,
                       int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  MemReader reader{buf, static_cast<size_t>(len), 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  int H = png_get_image_height(png, info);
  int W = png_get_image_width(png, info);
  if (H > max_h || W > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (color & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_swap(png);  // PNG is big-endian on disk
  png_read_update_info(png, info);
  if (depth == 16) {
    for (int y = 0; y < H; ++y)
      png_read_row(png, reinterpret_cast<png_bytep>(out +
                   static_cast<size_t>(y) * W), nullptr);
  } else {
    unsigned char* row8 = static_cast<unsigned char*>(std::malloc(W));
    for (int y = 0; y < H; ++y) {
      png_read_row(png, row8, nullptr);
      unsigned short* o = out + static_cast<size_t>(y) * W;
      for (int x = 0; x < W; ++x) o[x] = row8[x];
    }
    std::free(row8);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  *h = H;
  *w = W;
  return 0;
}

// depth_index_u8 (data/composition.py): exact median from a histogram,
// clip at min(3*median, 10000), NORM_MINMAX to [0,255] with
// round-half-even — bit-identical to the cv2/numpy host path and the
// device compose (ops/compose.py). Single histogram pass + single output
// pass.
void mmt_depth_index_u8(const unsigned short* depth, long n, int clip,
                        unsigned char* out) {
  // One histogram pass gives the median, the post-clip min/max AND a
  // 65536-entry value->index LUT (the normalize is evaluated once per
  // distinct value, not per pixel), then one LUT pass writes the output.
  static thread_local unsigned int hist[65536];
  static thread_local unsigned char vlut[65536];
  std::memset(hist, 0, sizeof(hist));
  int vmin = 65535, vmax = 0;
  for (long i = 0; i < n; ++i) {
    unsigned short v = depth[i];
    hist[v]++;
    if (v < vmin) vmin = v;
    if (v > vmax) vmax = v;
  }
  double clip_max = 1e30;
  if (clip) {
    long k_lo = (n - 1) / 2 + 1;  // 1-indexed central order stats
    long k_hi = (n % 2) ? k_lo : n / 2 + 1;
    long acc = 0;
    int lo = -1, hi = -1;
    for (int v = vmin; v <= vmax; ++v) {
      acc += hist[v];
      if (lo < 0 && acc >= k_lo) lo = v;
      if (acc >= k_hi) {
        hi = v;
        break;
      }
    }
    double med = (lo + hi) / 2.0;
    clip_max = med * 3.0 < 10000.0 ? med * 3.0 : 10000.0;
  }
  // numpy semantics (composition.py: xmap[xmap > max_depth] = max_depth):
  // pixels strictly above the float clip become the TRUNCATED uint16 clip
  // value; the median can be x.5 (even-count map), so trunc matters.
  int cm_t = clip_max < 65535.0 ? static_cast<int>(clip_max) : 65535;
  int e_min = vmin <= clip_max ? vmin : cm_t;
  int e_max;
  if (vmax <= clip_max) {
    e_max = vmax;
  } else {
    e_max = cm_t;  // some pixel clipped -> cm_t is attained
    for (int v = static_cast<int>(clip_max); v >= vmin; --v) {
      if (hist[v]) {
        if (v > e_max) e_max = v;
        break;
      }
    }
  }
  double mn = e_min, mx = e_max;
  // cv2.normalize(NORM_MINMAX): scale = 255*(1/(mx-mn)) and
  // shift = -mn*scale in double, cast to float, then the per-element
  // kernel is a single-rounded f32 FMA v*scale+shift followed by
  // cvRound (half-even) — verified against cv2 5.0 on exact-.5 ties.
  double inv = 1.0 / (mx > mn ? mx - mn : 1.0);
  float a = static_cast<float>(255.0 * inv);
  float b = static_cast<float>(0.0 - mn * (255.0 * inv));
  for (int v = vmin; v <= vmax; ++v) {
    int e = v <= clip_max ? v : cm_t;
    float s = std::nearbyintf(std::fmaf(static_cast<float>(e), a, b));
    vlut[v] = s < 0.f ? 0 : (s > 255.f ? 255 : static_cast<unsigned char>(s));
  }
  for (long i = 0; i < n; ++i) out[i] = vlut[depth[i]];
}

// Fused per-frame entry for the streaming path: read + decode the color
// JPEG into `rgb_out` (H*W*3, tightly packed) and the 16-bit depth PNG
// into the JET index plane `idx_out` (H*W). Frames whose encoded dims
// differ from (H, W) are rejected (-2/-4) — the batched pipeline runs on
// fixed shapes. Returns 0 ok; -1/-3 io or decode error on jpeg/png.
int mmt_decode_pair_rgb_index(const char* jpeg_path, const char* png_path,
                              unsigned char* rgb_out, unsigned char* idx_out,
                              int H, int W, int clip) {
  long jlen = 0, plen = 0;
  unsigned char* jbuf = read_file(jpeg_path, &jlen);
  if (!jbuf) return -1;
  int h = 0, w = 0;
  int rc = mmt_decode_jpeg_rgb(jbuf, jlen, rgb_out, H, W, &h, &w);
  std::free(jbuf);
  if (rc != 0) return rc == -2 ? -2 : -1;
  if (h != H || w != W) return -2;

  unsigned char* pbuf = read_file(png_path, &plen);
  if (!pbuf) return -3;
  static thread_local unsigned short* dscratch = nullptr;
  static thread_local size_t dscratch_n = 0;
  size_t need = static_cast<size_t>(H) * W;
  if (dscratch_n < need) {
    std::free(dscratch);
    dscratch = static_cast<unsigned short*>(std::malloc(need * 2));
    dscratch_n = dscratch ? need : 0;
    if (!dscratch) {
      std::free(pbuf);
      return -3;
    }
  }
  rc = mmt_decode_png_u16(pbuf, plen, dscratch, H, W, &h, &w);
  std::free(pbuf);
  if (rc != 0) return rc == -2 ? -4 : -3;
  if (h != H || w != W) return -4;
  mmt_depth_index_u8(dscratch, static_cast<long>(H) * W, clip, idx_out);
  return 0;
}

}  // extern "C"

extern "C" {

// Decode a 4:2:0 JPEG to raw YCbCr planes WITHOUT upsampling or color
// conversion: Y (H x W), Cb and Cr (H/2 x W/2). This is the 2.5-byte/px
// serving upload (vs 4 for rgb+index): chroma upsample + BT.601 conversion
// run on the TPU (ops/compose.py::yuv420_to_rgb_device). Requires H and W
// to be multiples of 16 (exact iMCU rows; typical camera/benchmark sizes
// qualify) and 2x2-subsampled 3-component input — returns -5 otherwise so
// callers fall back to the RGB path.
int mmt_decode_jpeg_yuv420(const unsigned char* buf, long len,
                           unsigned char* y_out, unsigned char* cb_out,
                           unsigned char* cr_out, int H, int W) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.num_components != 3 ||
      cinfo.comp_info[0].h_samp_factor != 2 ||
      cinfo.comp_info[0].v_samp_factor != 2 ||
      cinfo.comp_info[1].h_samp_factor != 1 ||
      cinfo.comp_info[1].v_samp_factor != 1 ||
      cinfo.comp_info[2].h_samp_factor != 1 ||
      cinfo.comp_info[2].v_samp_factor != 1 ||
      static_cast<int>(cinfo.image_height) != H ||
      static_cast<int>(cinfo.image_width) != W ||
      H % 16 != 0 || W % 16 != 0) {
    jpeg_destroy_decompress(&cinfo);
    return -5;
  }
  cinfo.raw_data_out = TRUE;
  jpeg_start_decompress(&cinfo);
  JSAMPROW y_rows[16], cb_rows[8], cr_rows[8];
  JSAMPARRAY planes[3] = {y_rows, cb_rows, cr_rows};
  while (cinfo.output_scanline < cinfo.output_height) {
    int base = cinfo.output_scanline;
    for (int r = 0; r < 16; ++r)
      y_rows[r] = y_out + static_cast<size_t>(base + r) * W;
    for (int r = 0; r < 8; ++r) {
      cb_rows[r] = cb_out + static_cast<size_t>(base / 2 + r) * (W / 2);
      cr_rows[r] = cr_out + static_cast<size_t>(base / 2 + r) * (W / 2);
    }
    jpeg_read_raw_data(&cinfo, planes, 16);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Streaming variant of mmt_decode_pair_rgb_index at 2.5 B/px: YCbCr raw
// planes + depth JET index. Falls back with -5 when the JPEG is not plain
// 4:2:0 at the expected dims (caller then uses the RGB path).
int mmt_decode_pair_yuv_index(const char* jpeg_path, const char* png_path,
                              unsigned char* y_out, unsigned char* cb_out,
                              unsigned char* cr_out, unsigned char* idx_out,
                              int H, int W, int clip) {
  long jlen = 0, plen = 0;
  unsigned char* jbuf = read_file(jpeg_path, &jlen);
  if (!jbuf) return -1;
  int rc = mmt_decode_jpeg_yuv420(jbuf, jlen, y_out, cb_out, cr_out, H, W);
  std::free(jbuf);
  if (rc != 0) return rc;

  unsigned char* pbuf = read_file(png_path, &plen);
  if (!pbuf) return -3;
  static thread_local unsigned short* dscratch2 = nullptr;
  static thread_local size_t dscratch2_n = 0;
  size_t need = static_cast<size_t>(H) * W;
  if (dscratch2_n < need) {
    std::free(dscratch2);
    dscratch2 = static_cast<unsigned short*>(std::malloc(need * 2));
    dscratch2_n = dscratch2 ? need : 0;
    if (!dscratch2) {
      std::free(pbuf);
      return -3;
    }
  }
  int h = 0, w = 0;
  rc = mmt_decode_png_u16(pbuf, plen, dscratch2, H, W, &h, &w);
  std::free(pbuf);
  if (rc != 0 || h != H || w != W) return -4;
  mmt_depth_index_u8(dscratch2, static_cast<long>(H) * W, clip, idx_out);
  return 0;
}

}  // extern "C"
