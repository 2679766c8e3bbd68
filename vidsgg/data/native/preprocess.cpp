// Native frame preprocessing for the vidsgg input pipeline.
//
// The reference preprocesses frames per DataLoader worker in Python/cv2
// (dataloader/AG/action_genome.py:175-254: BGR mean subtraction, min-side-600
// bilinear resize, zero-pad to the per-video max H/W). That per-frame Python
// loop is the host-side bottleneck once the device path is fast; this
// translation unit implements the same math in C++ with OpenMP-free
// multithreading (std::thread) so a video's frames are prepared in parallel
// into one padded float32 blob ready for host->device transfer.
//
// Bilinear resize matches cv2.INTER_LINEAR coordinate semantics:
//   src = (dst + 0.5) * (1 / scale) - 0.5, edge-clamped.
//
// Exposed C ABI (consumed by vidsgg.data.native via ctypes):
//   vidsgg_prep_frames(src, n, h, w, target_min_side, means,
//                      out, out_h, out_w)  -> per-frame scale factor

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Resize one HxWx3 uint8 BGR image to (oh, ow), subtract channel means,
// write float32 into a (pad_h, pad_w, 3) row-major slot (zero-padded).
void resize_subtract_pad(const uint8_t* src, int h, int w,
                         float* dst, int oh, int ow, int pad_h, int pad_w,
                         const float* means) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    float* out_row = dst + (static_cast<int64_t>(y) * pad_w) * 3;
    const uint8_t* r0 = src + (static_cast<int64_t>(y0) * w) * 3;
    const uint8_t* r1 = src + (static_cast<int64_t>(y1) * w) * 3;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = fx - x0;
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * r0[x0 * 3 + c] + w01 * r0[x1 * 3 + c] +
                        w10 * r1[x0 * 3 + c] + w11 * r1[x1 * 3 + c];
        out_row[x * 3 + c] = v - means[c];
      }
    }
    // right padding already zero (caller zero-initializes)
  }
}

}  // namespace

extern "C" {

// src:     n contiguous HxWx3 uint8 BGR frames (all same raw size)
// out:     n * out_h * out_w * 3 float32, caller-zeroed
// returns: the scale factor applied (min-side -> target_min_side)
float vidsgg_prep_frames(const uint8_t* src, int n, int h, int w,
                         int target_min_side, const float* means,
                         float* out, int out_h, int out_w) {
  const float scale =
      static_cast<float>(target_min_side) / static_cast<float>(std::min(h, w));
  const int oh = std::min(static_cast<int>(std::round(h * scale)), out_h);
  const int ow = std::min(static_cast<int>(std::round(w * scale)), out_w);

  const int64_t in_stride = static_cast<int64_t>(h) * w * 3;
  const int64_t out_stride = static_cast<int64_t>(out_h) * out_w * 3;

  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min<unsigned>(n_threads, static_cast<unsigned>(n));
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (unsigned t = 0; t < n_threads; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += static_cast<int>(n_threads)) {
        resize_subtract_pad(src + i * in_stride, h, w, out + i * out_stride,
                            oh, ow, out_h, out_w, means);
      }
    });
  }
  for (auto& th : pool) th.join();
  return scale;
}

// Pairwise IoU with the inclusive +1 convention (host-side evaluator path;
// replaces the reference's Cython bbox_overlaps).
void vidsgg_bbox_overlaps(const float* boxes, int n, const float* query,
                          int k, float* out) {
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + i * 4;
    const float area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1);
    for (int j = 0; j < k; ++j) {
      const float* q = query + j * 4;
      const float iw =
          std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1;
      const float ih =
          std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1;
      float v = 0.0f;
      if (iw > 0 && ih > 0) {
        const float area_q = (q[2] - q[0] + 1) * (q[3] - q[1] + 1);
        const float inter = iw * ih;
        v = inter / (area_b + area_q - inter);
      }
      out[static_cast<int64_t>(i) * k + j] = v;
    }
  }
}

}  // extern "C"
