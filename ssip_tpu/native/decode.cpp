// ssip_tpu native JPEG decoder.
//
// Host-side decode is the end-to-end bottleneck of the extraction pipeline
// (SURVEY.md §6: single-core PIL full decode ≈ 175 imgs/s). This libjpeg
// wrapper removes the Python/PIL overhead, supports DCT-domain scaled decode
// (scale_denom ∈ {1,2,4,8} — decode 512² JPEGs straight to 256² for the
// throughput path), forces RGB output, and is called with the GIL released
// so Python-level thread pools overlap decode with device dispatch.
//
// C ABI only — consumed via ctypes (ssip_tpu/native/decoder.py).

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void silent_output(j_common_ptr) {}

}  // namespace

extern "C" {

// Reads header only; returns 0 on success and fills (w, h) with the
// dimensions that a decode at the given scale_denom will produce.
int ssip_jpeg_dims(const char* path, int scale_denom, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom > 0 ? scale_denom : 1;
  jpeg_calc_output_dimensions(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Full decode into caller-provided buffer (capacity bytes). Output is always
// 3-channel RGB, row-major HWC. Returns 0 on success; fills (w, h).
int ssip_jpeg_decode(const char* path, int scale_denom, unsigned char* out,
                     long capacity, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom > 0 ? scale_denom : 1;
  cinfo.out_color_space = JCS_RGB;  // grayscale JPEGs get replicated by libjpeg
  jpeg_start_decompress(&cinfo);

  const int width = static_cast<int>(cinfo.output_width);
  const int height = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;  // 3 after JCS_RGB
  const long needed = static_cast<long>(width) * height * comps;
  if (comps != 3 || needed > capacity) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }

  const long row_stride = static_cast<long>(width) * comps;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<long>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *w = width;
  *h = height;
  return 0;
}

}  // extern "C"
