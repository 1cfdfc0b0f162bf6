// odtpu_io — native runtime IO for online_detection_tpu.
//
// The reference's runtime-native pieces live in external CUDA/C++ deps
// (SURVEY.md §2.3); on TPU the compute kernels are Pallas/XLA, and the
// native layer that actually matters is the HOST side of the streaming
// pipeline: image decode, resize, canvas packing, and annotation parsing
// feed the per-image harvest/inference loop (the reference's known
// bottleneck is its per-image Python loop, SURVEY.md §3.2).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image):
//   - odtpu_decode_image: JPEG/PNG -> RGB24 buffer
//   - odtpu_resize_bilinear_u8: RGB24 resize (PIL-equivalent box centers)
//   - odtpu_prepare_canvas: decode + resize(min/max side) + pad to canvas,
//     returning the uint8 canvas + scale + scaled size in one call
//   - odtpu_parse_voc_xml: VOC XML -> boxes/labels(difficult) arrays
//   - odtpu_prefetcher_*: a pthread worker pool that runs prepare_canvas
//     over a file list ahead of the consumer (double-ended ring).
//
// Build: make -C native   (produces libodtpu_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <mutex>
#include <condition_variable>
#include <atomic>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------- decode

struct OdtpuImage {
  uint8_t* data;  // RGB24, row-major
  int width;
  int height;
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

static bool decode_jpeg(const uint8_t* buf, size_t len, OdtpuImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->data = static_cast<uint8_t*>(malloc(size_t(out->width) * out->height * 3));
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data + size_t(cinfo.output_scanline) * out->width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  size_t take = std::min(n, s->len - s->pos);
  memcpy(out, s->buf + s->pos, take);
  s->pos += take;
}

static bool decode_png(const uint8_t* buf, size_t len, OdtpuImage* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->width = w;
  out->height = h;
  out->data = static_cast<uint8_t*>(malloc(size_t(w) * h * 3));
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++) rows[y] = out->data + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// Decode a JPEG or PNG file into caller-freed RGB24. Returns 0 on success.
int odtpu_decode_image(const char* path, uint8_t** data, int* width, int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (fread(buf.data(), 1, len, f) != size_t(len)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  OdtpuImage img{};
  bool ok = false;
  if (len > 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    ok = decode_jpeg(buf.data(), len, &img);
  } else {
    ok = decode_png(buf.data(), len, &img);
  }
  if (!ok) return -2;
  *data = img.data;
  *width = img.width;
  *height = img.height;
  return 0;
}

void odtpu_free(void* p) { free(p); }

// ------------------------------------------------------------- resize/pad

// Bilinear RGB24 resize with half-pixel centers (align_corners=False).
void odtpu_resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                              uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sh / dh - 0.5f;
    fy = std::max(0.0f, std::min(fy, float(sh - 1)));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sw / dw - 0.5f;
      fx = std::max(0.0f, std::min(fx, float(sw - 1)));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; c++) {
        float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// min/max-side resize scale (data/transforms.resize_scale semantics).
static float resize_scale(int w, int h, int min_size, int max_size) {
  int size = min_size;
  float mx = float(std::max(w, h));
  float mn = float(std::min(w, h));
  if (mx / mn * size > max_size)
    size = int(max_size * mn / mx + 0.5f);
  if ((w <= h && w == size) || (h <= w && h == size)) return 1.0f;
  return size / mn;
}

// output-size arithmetic (data/transforms.scaled_size semantics: the
// reference's torchvision/maskrcnn truncation of the long side).
static void scaled_size(int w, int h, int min_size, int max_size,
                        int* sw, int* sh) {
  int size = min_size;
  float mx = float(std::max(w, h));
  float mn = float(std::min(w, h));
  if (mx / mn * size > max_size)
    size = int(max_size * mn / mx + 0.5f);
  if ((w <= h && w == size) || (h <= w && h == size)) {
    *sw = w;
    *sh = h;
    return;
  }
  if (w < h) {
    *sw = size;
    *sh = int(double(size) * h / w);
  } else {
    *sh = size;
    *sw = int(double(size) * w / h);
  }
}

// Decode + resize + pad into a caller-allocated [ch, cw, 3] uint8 canvas.
// Returns 0 and fills scale/scaled_w/scaled_h on success.
int odtpu_prepare_canvas(const char* path, uint8_t* canvas, int ch, int cw,
                         int min_size, int max_size, float* scale,
                         int* scaled_w, int* scaled_h) {
  uint8_t* rgb = nullptr;
  int w = 0, h = 0;
  int rc = odtpu_decode_image(path, &rgb, &w, &h);
  if (rc != 0) return rc;
  float s = resize_scale(w, h, min_size, max_size);
  int sw, sh;
  scaled_size(w, h, min_size, max_size, &sw, &sh);
  std::vector<uint8_t> resized;
  const uint8_t* src = rgb;
  if (sw != w || sh != h) {
    resized.resize(size_t(sw) * sh * 3);
    odtpu_resize_bilinear_u8(rgb, h, w, resized.data(), sh, sw);
    src = resized.data();
  }
  memset(canvas, 0, size_t(ch) * cw * 3);
  int copy_h = std::min(sh, ch), copy_w = std::min(sw, cw);
  for (int y = 0; y < copy_h; y++)
    memcpy(canvas + size_t(y) * cw * 3, src + size_t(y) * sw * 3, size_t(copy_w) * 3);
  free(rgb);
  *scale = s;
  *scaled_w = sw;
  *scaled_h = sh;
  return 0;
}

// ----------------------------------------------------------------- VOC XML

// Minimal, schema-specific VOC XML reader (no general XML lib): extracts
// size and per-object name/difficult/bndbox. Names are returned packed as
// NUL-separated strings. Caller frees both buffers with odtpu_free.
static std::string tag_text(const std::string& s, const std::string& tag,
                            size_t from, size_t* end_out) {
  std::string open = "<" + tag + ">";
  std::string close = "</" + tag + ">";
  size_t a = s.find(open, from);
  if (a == std::string::npos) return "";
  a += open.size();
  size_t b = s.find(close, a);
  if (b == std::string::npos) return "";
  if (end_out) *end_out = b + close.size();
  return s.substr(a, b - a);
}

int odtpu_parse_voc_xml(const char* path, int* img_w, int* img_h,
                        float** boxes, int** difficult, char** names,
                        int* num_objects) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string s(len, '\0');
  if (fread(&s[0], 1, len, f) != size_t(len)) {
    fclose(f);
    return -1;
  }
  fclose(f);

  size_t size_pos = s.find("<size>");
  *img_w = atoi(tag_text(s, "width", size_pos, nullptr).c_str());
  *img_h = atoi(tag_text(s, "height", size_pos, nullptr).c_str());

  std::vector<float> bx;
  std::vector<int> diff;
  std::string packed_names;
  size_t pos = 0;
  int n = 0;
  while ((pos = s.find("<object>", pos)) != std::string::npos) {
    size_t obj_end = s.find("</object>", pos);
    std::string name = tag_text(s, "name", pos, nullptr);
    std::string d = tag_text(s, "difficult", pos, nullptr);
    size_t bb = s.find("<bndbox>", pos);
    if (bb == std::string::npos || bb > obj_end) break;
    bx.push_back(atof(tag_text(s, "xmin", bb, nullptr).c_str()));
    bx.push_back(atof(tag_text(s, "ymin", bb, nullptr).c_str()));
    bx.push_back(atof(tag_text(s, "xmax", bb, nullptr).c_str()));
    bx.push_back(atof(tag_text(s, "ymax", bb, nullptr).c_str()));
    diff.push_back(atoi(d.c_str()));
    // lower-cased, trimmed (icubworld.py name.lower().strip())
    std::string nm;
    for (char c : name)
      if (!isspace(static_cast<unsigned char>(c))) nm.push_back(tolower(c));
    packed_names += nm;
    packed_names.push_back('\0');
    n++;
    pos = obj_end;
  }
  *num_objects = n;
  *boxes = static_cast<float*>(malloc(bx.size() * sizeof(float)));
  memcpy(*boxes, bx.data(), bx.size() * sizeof(float));
  *difficult = static_cast<int*>(malloc(diff.size() * sizeof(int)));
  memcpy(*difficult, diff.data(), diff.size() * sizeof(int));
  *names = static_cast<char*>(malloc(packed_names.size() + 1));
  memcpy(*names, packed_names.data(), packed_names.size());
  (*names)[packed_names.size()] = '\0';
  return 0;
}

// --------------------------------------------------------------- prefetch

struct PrefetchSlot {
  std::vector<uint8_t> canvas;
  float scale;
  int scaled_w, scaled_h;
  int status;  // 0 pending, 1 ready, <0 error
};

struct Prefetcher {
  std::vector<std::string> paths;
  int ch, cw, min_size, max_size;
  std::vector<PrefetchSlot> slots;
  std::atomic<int> next_job{0};
  std::atomic<int> consumed{0};
  int window;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};

  void worker() {
    while (!stop.load()) {
      int job = next_job.fetch_add(1);
      if (job >= int(paths.size())) return;
      {
        // bound how far ahead of the consumer we run
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || job < consumed.load() + window;
        });
        if (stop.load()) return;
      }
      PrefetchSlot& slot = slots[job];
      slot.canvas.resize(size_t(ch) * cw * 3);
      int rc = odtpu_prepare_canvas(paths[job].c_str(), slot.canvas.data(), ch,
                                    cw, min_size, max_size, &slot.scale,
                                    &slot.scaled_w, &slot.scaled_h);
      {
        std::lock_guard<std::mutex> lk(mu);
        slot.status = rc == 0 ? 1 : rc;
      }
      cv_ready.notify_all();
    }
  }
};

void* odtpu_prefetcher_create(const char** paths, int n_paths, int ch, int cw,
                              int min_size, int max_size, int n_threads,
                              int window) {
  Prefetcher* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->ch = ch;
  p->cw = cw;
  p->min_size = min_size;
  p->max_size = max_size;
  p->window = std::max(window, 1);
  p->slots.resize(n_paths);
  for (int i = 0; i < std::max(n_threads, 1); i++)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Blocks until item `index` is ready; copies into caller canvas. Returns 0 ok.
int odtpu_prefetcher_get(void* handle, int index, uint8_t* canvas, float* scale,
                         int* scaled_w, int* scaled_h) {
  Prefetcher* p = static_cast<Prefetcher*>(handle);
  if (index < 0 || index >= int(p->paths.size())) return -1;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    // advance the window to cover this request first — a random-access get
    // beyond the current window must release the workers or they deadlock
    p->consumed.store(std::max(p->consumed.load(), index + 1));
    p->cv_space.notify_all();
    p->cv_ready.wait(lk, [&] { return p->slots[index].status != 0; });
  }
  PrefetchSlot& slot = p->slots[index];
  if (slot.status < 0) return slot.status;
  memcpy(canvas, slot.canvas.data(), slot.canvas.size());
  *scale = slot.scale;
  *scaled_w = slot.scaled_w;
  *scaled_h = slot.scaled_h;
  slot.canvas.clear();
  slot.canvas.shrink_to_fit();
  p->consumed.store(std::max(p->consumed.load(), index + 1));
  p->cv_space.notify_all();
  return 0;
}

void odtpu_prefetcher_destroy(void* handle) {
  Prefetcher* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_space.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
