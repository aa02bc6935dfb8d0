// _mjvideo_native: fused host-side preprocessing for the video pipeline.
//
// Replaces the reference's per-tile PIL/torchvision chain
// (scripts/data_processor/data.py:56-64: PIL bicubic resize -> ToTensor ->
// ImageNet Normalize) with one multithreaded C++ pass:
//
//   uint8 frames (N, H, W, 3) -> fp32 normalized NHWC tiles (N, S, S, 3)
//
// The resampler is PIL-compatible: separable bicubic (Keys a = -0.5,
// support 2) with antialiasing — the kernel footprint scales with the
// downsampling factor exactly as PIL's ImagingResample does, so outputs
// match PIL within rounding (PIL quantizes the horizontal pass to uint8;
// we keep float32 end-to-end, which is strictly more accurate).
//
// Exposed via the CPython C API (no pybind11 in this image); threading via
// std::thread across frames.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kA = -0.5;  // Keys cubic parameter (PIL's BICUBIC)

double bicubic_filter(double x) {
  x = std::fabs(x);
  if (x < 1.0) return ((kA + 2.0) * x - (kA + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * kA;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;     // (out_size) start index
  std::vector<int> counts;     // (out_size) window length
  std::vector<double> values;  // (out_size * kmax) weights
  int kmax;
};

// Precompute the resampling windows exactly as PIL's precompute_coeffs.
Coeffs precompute(int in_size, int out_size) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;
  int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;

  Coeffs c;
  c.kmax = kmax;
  c.bounds.resize(out_size);
  c.counts.resize(out_size);
  c.values.assign(static_cast<size_t>(out_size) * kmax, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(
        std::min(static_cast<double>(in_size), std::ceil(center + support)));
    double ss = 1.0 / filterscale;
    double wsum = 0.0;
    double* w = &c.values[static_cast<size_t>(xx) * kmax];
    int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      double weight = bicubic_filter((xmin + i - center + 0.5) * ss);
      w[i] = weight;
      wsum += weight;
    }
    if (wsum != 0.0) {
      for (int i = 0; i < n; ++i) w[i] /= wsum;
    }
    c.bounds[xx] = xmin;
    c.counts[xx] = n;
  }
  return c;
}

// Resize one frame (H, W, 3) uint8 -> (S, S, 3) float32 (unnormalized 0-255).
void resize_frame(const uint8_t* src, int h, int w, const Coeffs& cx,
                  const Coeffs& cy, int out_size, float* dst,
                  std::vector<float>& tmp /* h * out_size * 3 */) {
  // Horizontal pass: (h, w, 3) -> (h, out, 3), float.
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = &tmp[static_cast<size_t>(y) * out_size * 3];
    for (int xx = 0; xx < out_size; ++xx) {
      const double* wv = &cx.values[static_cast<size_t>(xx) * cx.kmax];
      int x0 = cx.bounds[xx], n = cx.counts[xx];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + static_cast<size_t>(x0 + i) * 3;
        double wgt = wv[i];
        acc0 += wgt * p[0];
        acc1 += wgt * p[1];
        acc2 += wgt * p[2];
      }
      trow[xx * 3 + 0] = static_cast<float>(acc0);
      trow[xx * 3 + 1] = static_cast<float>(acc1);
      trow[xx * 3 + 2] = static_cast<float>(acc2);
    }
  }
  // Vertical pass: (h, out, 3) -> (out, out, 3).
  for (int yy = 0; yy < out_size; ++yy) {
    const double* wv = &cy.values[static_cast<size_t>(yy) * cy.kmax];
    int y0 = cy.bounds[yy], n = cy.counts[yy];
    float* drow = dst + static_cast<size_t>(yy) * out_size * 3;
    for (int xx = 0; xx < out_size * 3; ++xx) {
      double acc = 0;
      for (int i = 0; i < n; ++i) {
        acc += wv[i] * tmp[static_cast<size_t>(y0 + i) * out_size * 3 + xx];
      }
      drow[xx] = static_cast<float>(acc);
    }
  }
}

// resize_normalize(frames_bytes, n, h, w, out_size, mean3, std3, clip)
//   frames: contiguous uint8 buffer (n, h, w, 3)
//   returns: bytes of float32 (n, out, out, 3), normalized.
PyObject* resize_normalize(PyObject*, PyObject* args) {
  Py_buffer buf;
  int n, h, w, out_size, clip;
  double m0, m1, m2, s0, s1, s2;
  if (!PyArg_ParseTuple(args, "y*iiii(ddd)(ddd)i", &buf, &n, &h, &w,
                        &out_size, &m0, &m1, &m2, &s0, &s1, &s2, &clip)) {
    return nullptr;
  }
  if (buf.len < static_cast<Py_ssize_t>(n) * h * w * 3) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "frame buffer too small");
    return nullptr;
  }

  size_t out_elems = static_cast<size_t>(n) * out_size * out_size * 3;
  PyObject* out_bytes =
      PyBytes_FromStringAndSize(nullptr, out_elems * sizeof(float));
  if (!out_bytes) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float* out = reinterpret_cast<float*>(PyBytes_AS_STRING(out_bytes));
  const uint8_t* src = static_cast<const uint8_t*>(buf.buf);

  const float mean[3] = {static_cast<float>(m0), static_cast<float>(m1),
                         static_cast<float>(m2)};
  const float stdv[3] = {static_cast<float>(s0), static_cast<float>(s1),
                         static_cast<float>(s2)};

  Py_BEGIN_ALLOW_THREADS;
  Coeffs cx = precompute(w, out_size);
  Coeffs cy = precompute(h, out_size);

  int n_threads = std::min<int>(
      n, std::max(1u, std::thread::hardware_concurrency()));
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      std::vector<float> tmp(static_cast<size_t>(h) * out_size * 3);
      for (int f = t; f < n; f += n_threads) {
        float* dst = out + static_cast<size_t>(f) * out_size * out_size * 3;
        resize_frame(src + static_cast<size_t>(f) * h * w * 3, h, w, cx, cy,
                     out_size, dst, tmp);
        // Fused normalize: PIL would clip to uint8 here; 'clip' emulates
        // that quantization boundary behavior (clamp only, no rounding).
        size_t m = static_cast<size_t>(out_size) * out_size;
        for (size_t i = 0; i < m; ++i) {
          for (int ch = 0; ch < 3; ++ch) {
            float v = dst[i * 3 + ch];
            if (clip) v = std::min(255.0f, std::max(0.0f, v));
            dst[i * 3 + ch] = (v / 255.0f - mean[ch]) / stdv[ch];
          }
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&buf);
  return out_bytes;
}

PyMethodDef kMethods[] = {
    {"resize_normalize", resize_normalize, METH_VARARGS,
     "Fused PIL-compatible bicubic resize + ImageNet normalize (threaded)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_mjvideo_native",
                       "Native host preprocessing kernels.", -1, kMethods,
                       nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit__mjvideo_native(void) {
  return PyModule_Create(&kModule);
}
