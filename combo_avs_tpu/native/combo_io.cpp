// combo_io: native image decode for the data loader.
//
// The reference inherits detectron2's torch DataLoader, whose hot path
// (decode + collate) runs in native worker processes (SURVEY §2.1 L0
// "framework substrate"). This module is the TPU repo's native equivalent:
// PNG (libpng) / JPEG (libjpeg) decode with an std::thread pool that
// releases the GIL, so the Python TrainLoader's prefetch thread can keep a
// full video (5-10 frames + GT + Maskige) decoding in parallel on the host
// while the chip runs the step.
//
// Python API (module combo_avs_tpu.native._combo_io):
//   decode(path: str, gray: bool = False) -> np.uint8 [H,W] | [H,W,3] (RGB)
//   decode_batch(paths: list[str], gray: bool = False, threads: int = 4)
//       -> list[np.ndarray]   (order preserved; GIL released while decoding)
//
// Gray conversion matches cv2.IMREAD_GRAYSCALE's fixed-point BT.601:
//   y = (r*4899 + g*9617 + b*1868 + 8192) >> 14
// PNG decode is bit-exact vs cv2 (same libpng semantics: strip 16->8,
// palette/gray expand, alpha dropped). Built by native/setup.py; the Python
// loader falls back to cv2 when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  std::vector<unsigned char> data;  // H*W*(1|3), gray or RGB
  int h = 0, w = 0, c = 0;
  std::string error;
};

inline unsigned char rgb_to_gray(unsigned r, unsigned g, unsigned b) {
  // cv2's fixed-point BT.601 (modules/imgproc/src/color_lab... semantics)
  return (unsigned char)((r * 4899u + g * 9617u + b * 1868u + 8192u) >> 14);
}

void gray_from_rgb(Decoded& d) {
  std::vector<unsigned char> g((size_t)d.h * d.w);
  const unsigned char* p = d.data.data();
  for (size_t i = 0; i < g.size(); ++i, p += 3) g[i] = rgb_to_gray(p[0], p[1], p[2]);
  d.data.swap(g);
  d.c = 1;
}

void rgb_from_gray(Decoded& d) {
  std::vector<unsigned char> rgb((size_t)d.h * d.w * 3);
  for (size_t i = 0; i < (size_t)d.h * d.w; ++i)
    rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = d.data[i];
  d.data.swap(rgb);
  d.c = 3;
}

// ----------------------------------------------------------------- PNG
bool decode_png(FILE* f, Decoded& out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { out.error = "png_create_read_struct failed"; return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); out.error = "png info failed"; return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    out.error = "libpng decode error";
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out.h = (int)h; out.w = (int)w; out.c = channels;
  out.data.resize((size_t)h * w * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i) rows[i] = out.data.data() + (size_t)i * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ----------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jmp, 1);
}

bool decode_jpeg(FILE* f, Decoded& out, bool gray = false) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    out.error = "libjpeg decode error";
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // gray: let libjpeg emit luminance directly (JCS_GRAYSCALE), matching
  // cv2.IMREAD_GRAYSCALE bit-for-bit — decoding RGB then applying BT.601
  // host-side differs by +-1 (ADVICE r3)
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.h = (int)cinfo.output_height;
  out.w = (int)cinfo.output_width;
  out.c = gray ? 1 : 3;
  out.data.resize((size_t)out.h * out.w * out.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out.data.data() + (size_t)cinfo.output_scanline * out.w * out.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------- dispatch
bool decode_file(const std::string& path, bool gray, Decoded& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) { out.error = "cannot open " + path; return false; }
  unsigned char magic[4] = {0, 0, 0, 0};
  size_t n = std::fread(magic, 1, 4, f);
  std::rewind(f);
  bool ok = false;
  if (n >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  } else if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out, gray);
  } else {
    out.error = "unknown image format: " + path;
  }
  std::fclose(f);
  if (!ok) return false;
  if (gray && out.c == 3) gray_from_rgb(out);
  if (!gray && out.c == 1) rgb_from_gray(out);
  return true;
}

PyObject* decoded_to_array(Decoded& d) {
  npy_intp dims3[3] = {d.h, d.w, d.c};
  npy_intp dims2[2] = {d.h, d.w};
  PyObject* arr = PyArray_SimpleNew(d.c == 1 ? 2 : 3, d.c == 1 ? dims2 : dims3, NPY_UINT8);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA((PyArrayObject*)arr), d.data.data(), d.data.size());
  return arr;
}

// ------------------------------------------------------------ py funcs
PyObject* py_decode(PyObject*, PyObject* args, PyObject* kwargs) {
  const char* path;
  int gray = 0;
  static const char* kwlist[] = {"path", "gray", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "s|p", (char**)kwlist, &path, &gray))
    return nullptr;
  Decoded d;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = decode_file(path, gray != 0, d);
  Py_END_ALLOW_THREADS
  if (!ok) {
    PyErr_SetString(PyExc_IOError, d.error.c_str());
    return nullptr;
  }
  return decoded_to_array(d);
}

PyObject* py_decode_batch(PyObject*, PyObject* args, PyObject* kwargs) {
  PyObject* paths_obj;
  int gray = 0;
  int threads = 4;
  static const char* kwlist[] = {"paths", "gray", "threads", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "O|pi", (char**)kwlist,
                                   &paths_obj, &gray, &threads))
    return nullptr;
  PyObject* seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<std::string> paths(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* it = PySequence_Fast_GET_ITEM(seq, i);
    const char* s = PyUnicode_AsUTF8(it);
    if (!s) { Py_DECREF(seq); return nullptr; }
    paths[i] = s;
  }
  Py_DECREF(seq);

  std::vector<Decoded> results(n);
  std::vector<char> ok(n, 0);
  if (threads < 1) threads = 1;
  if (threads > (int)n) threads = (int)n > 0 ? (int)n : 1;

  Py_BEGIN_ALLOW_THREADS
  {
    std::vector<std::thread> pool;
    std::atomic_int next{0};
    // simple work-stealing counter loop
    auto worker = [&]() {
      for (int i = next.fetch_add(1); i < (int)n; i = next.fetch_add(1))
        ok[i] = decode_file(paths[i], gray != 0, results[i]) ? 1 : 0;
    };
    for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS

  for (Py_ssize_t i = 0; i < n; ++i) {
    if (!ok[i]) {
      PyErr_SetString(PyExc_IOError, results[i].error.c_str());
      return nullptr;
    }
  }
  PyObject* out = PyList_New(n);
  if (!out) return nullptr;
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* arr = decoded_to_array(results[i]);
    if (!arr) { Py_DECREF(out); return nullptr; }
    PyList_SET_ITEM(out, i, arr);
  }
  return out;
}

PyMethodDef methods[] = {
    {"decode", (PyCFunction)py_decode, METH_VARARGS | METH_KEYWORDS,
     "decode(path, gray=False) -> uint8 ndarray (RGB or gray)"},
    {"decode_batch", (PyCFunction)py_decode_batch, METH_VARARGS | METH_KEYWORDS,
     "decode_batch(paths, gray=False, threads=4) -> list of uint8 ndarrays"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_combo_io",
                         "native PNG/JPEG decode for the AVS data loader",
                         -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__combo_io(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
