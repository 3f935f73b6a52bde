// See fcn_point_map.hpp.  Reference behaviours are cited inline.

#include "fcn_point_map.hpp"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <numeric>
#include <queue>

namespace tpufcn {

int otsu_threshold(const uint8_t* img, int n) {
  // Classic Otsu over a 256-bin histogram (cv::threshold THRESH_OTSU).
  double hist[256] = {0};
  for (int i = 0; i < n; ++i) hist[img[i]] += 1.0;
  double total = static_cast<double>(n);
  double sum = 0;
  for (int i = 0; i < 256; ++i) sum += i * hist[i];
  double sum_b = 0, w_b = 0;
  double max_var = -1.0;
  int thresh = 0;
  for (int t = 0; t < 256; ++t) {
    w_b += hist[t];
    if (w_b == 0) continue;
    double w_f = total - w_b;
    if (w_f == 0) break;
    sum_b += t * hist[t];
    double m_b = sum_b / w_b;
    double m_f = (sum - sum_b) / w_f;
    double var = w_b * w_f * (m_b - m_f) * (m_b - m_f);
    if (var > max_var) {
      max_var = var;
      thresh = t;
    }
  }
  return thresh;
}

std::vector<Rect> region_rects(const uint8_t* img, int h, int w,
                               int thresh, int area_thresh) {
  // BFS connected components (8-connectivity) over img > thresh; the
  // area gate mirrors the reference's contourArea > rect_thresh_ (=400,
  // reference fcn_point_map_node.cpp:5,141-152).
  std::vector<int> label(static_cast<size_t>(h) * w, -1);
  std::vector<Rect> rects;
  std::vector<int> stack;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int idx = y * w + x;
      if (label[idx] != -1 || img[idx] <= thresh) continue;
      int cur = static_cast<int>(rects.size());
      label[idx] = cur;
      stack.clear();
      stack.push_back(idx);
      int minx = x, maxx = x, miny = y, maxy = y;
      int area = 0;
      while (!stack.empty()) {
        int p = stack.back();
        stack.pop_back();
        ++area;
        int py = p / w, px = p % w;
        minx = std::min(minx, px); maxx = std::max(maxx, px);
        miny = std::min(miny, py); maxy = std::max(maxy, py);
        for (int dy = -1; dy <= 1; ++dy) {
          for (int dx = -1; dx <= 1; ++dx) {
            if (!dy && !dx) continue;
            int ny = py + dy, nx = px + dx;
            if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
            int q = ny * w + nx;
            if (label[q] == -1 && img[q] > thresh) {
              label[q] = cur;
              stack.push_back(q);
            }
          }
        }
      }
      if (area > area_thresh) {
        rects.push_back({minx, miny, maxx - minx + 1, maxy - miny + 1});
      } else {
        rects.push_back({0, 0, 0, 0});  // placeholder, filtered below
      }
    }
  }
  std::vector<Rect> out;
  for (const Rect& r : rects)
    if (r.w > 0 && r.h > 0) out.push_back(r);
  return out;
}

std::vector<Rect> region_mask(const uint8_t* img, int h, int w,
                              int area_thresh) {
  int t = otsu_threshold(img, h * w);
  return region_rects(img, h, w, t, area_thresh);
}

double rect_iou(const Rect& a, const Rect& b) {
  // Reference jaccardScore (fcn_point_map_node.cpp:128-133): plain
  // intersection over union of rects.
  int x1 = std::max(a.x, b.x), y1 = std::max(a.y, b.y);
  int x2 = std::min(a.x + a.w, b.x + b.w);
  int y2 = std::min(a.y + a.h, b.y + b.h);
  double inter = std::max(0, x2 - x1) * static_cast<double>(std::max(0, y2 - y1));
  double uni = static_cast<double>(a.w) * a.h + static_cast<double>(b.w) * b.h - inter;
  return uni > 0 ? inter / uni : 0.0;
}

namespace {

// 3-D kd-tree with fixed-radius search (the PCL KdTree role in
// EuclideanClusterExtraction, reference fcn_point_map_node.cpp:112-125).
struct KdTree {
  struct Node {
    int point;
    int left = -1, right = -1;
    int axis;
  };
  const float* pts;            // (n, 3)
  std::vector<Node> nodes;
  int root = -1;

  explicit KdTree(const float* xyz, const std::vector<int>& ids)
      : pts(xyz) {
    std::vector<int> work(ids);
    nodes.reserve(work.size());
    root = build(work, 0, static_cast<int>(work.size()), 0);
  }

  int build(std::vector<int>& ids, int lo, int hi, int axis) {
    if (lo >= hi) return -1;
    int mid = (lo + hi) / 2;
    std::nth_element(ids.begin() + lo, ids.begin() + mid, ids.begin() + hi,
                     [&](int a, int b) {
                       return pts[a * 3 + axis] < pts[b * 3 + axis];
                     });
    int me = static_cast<int>(nodes.size());
    nodes.push_back({ids[mid], -1, -1, axis});
    int l = build(ids, lo, mid, (axis + 1) % 3);
    int r = build(ids, mid + 1, hi, (axis + 1) % 3);
    nodes[me].left = l;
    nodes[me].right = r;
    return me;
  }

  void radius(const float* q, float tol, std::vector<int>& out) const {
    if (root >= 0) radius_rec(root, q, tol * tol, tol, out);
  }

  void radius_rec(int ni, const float* q, float tol2, float tol,
                  std::vector<int>& out) const {
    const Node& nd = nodes[ni];
    const float* p = pts + nd.point * 3;
    float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
    if (dx * dx + dy * dy + dz * dz <= tol2) out.push_back(nd.point);
    float delta = q[nd.axis] - p[nd.axis];
    int near = delta <= 0 ? nd.left : nd.right;
    int far = delta <= 0 ? nd.right : nd.left;
    if (near >= 0) radius_rec(near, q, tol2, tol, out);
    if (far >= 0 && std::fabs(delta) <= tol) radius_rec(far, q, tol2, tol, out);
  }
};

}  // namespace

int euclidean_cluster(const float* xyz, int n, float tol,
                      int min_size, int max_size, int* labels_out) {
  std::vector<int> valid;
  valid.reserve(n);
  for (int i = 0; i < n; ++i) {
    const float* p = xyz + i * 3;
    labels_out[i] = -1;
    if (std::isfinite(p[0]) && std::isfinite(p[1]) && std::isfinite(p[2]))
      valid.push_back(i);
  }
  if (valid.empty()) return 0;
  KdTree tree(xyz, valid);

  std::vector<char> seen(n, 0);
  std::vector<int> cluster, frontier, neigh;
  int next_label = 0;
  for (int seed : valid) {
    if (seen[seed]) continue;
    cluster.clear();
    frontier.clear();
    frontier.push_back(seed);
    seen[seed] = 1;
    while (!frontier.empty()) {
      int p = frontier.back();
      frontier.pop_back();
      cluster.push_back(p);
      neigh.clear();
      tree.radius(xyz + p * 3, tol, neigh);
      for (int q : neigh) {
        if (!seen[q]) {
          seen[q] = 1;
          frontier.push_back(q);
        }
      }
    }
    if (static_cast<int>(cluster.size()) >= min_size &&
        static_cast<int>(cluster.size()) <= max_size) {
      for (int p : cluster) labels_out[p] = next_label;
      ++next_label;
    }
  }
  return next_label;
}

}  // namespace tpufcn

extern "C" {

int fcn_otsu(const uint8_t* img, int n) {
  return tpufcn::otsu_threshold(img, n);
}

int fcn_region_rects(const uint8_t* img, int h, int w, int thresh,
                     int area_thresh, int max_rects, int* rects_out) {
  auto rects = thresh < 0 ? tpufcn::region_mask(img, h, w, area_thresh)
                          : tpufcn::region_rects(img, h, w, thresh,
                                                 area_thresh);
  int n = std::min<int>(static_cast<int>(rects.size()), max_rects);
  for (int i = 0; i < n; ++i) {
    rects_out[i * 4 + 0] = rects[i].x;
    rects_out[i * 4 + 1] = rects[i].y;
    rects_out[i * 4 + 2] = rects[i].w;
    rects_out[i * 4 + 3] = rects[i].h;
  }
  return n;
}

int fcn_euclidean_cluster(const float* xyz, int n, float tol,
                          int min_size, int max_size, int* labels_out) {
  return tpufcn::euclidean_cluster(xyz, n, tol, min_size, max_size,
                                   labels_out);
}

int fcn_point_map_process(const float* cloud, const uint8_t* mask,
                          const uint8_t* pmap, int h, int w,
                          float cluster_tol, int min_cluster,
                          int max_cluster, int area_thresh,
                          int keep_matched, int* labels_out) {
  using tpufcn::Rect;
  const int n = h * w;
  // regionMask on both images (reference callback :50-54)
  auto prects = tpufcn::region_mask(pmap, h, w, area_thresh);
  auto orects = tpufcn::region_mask(mask, h, w, area_thresh);

  // Fused-mask polarity (see PARITY.md "Known deviations"):
  //   keep_matched=1 (default) — gather points from obj-mask regions that
  //     DO intersect a probability-map region (the detector-confirmed
  //     objects).
  //   keep_matched=0 — reference polarity: the reference copies matched
  //     regions into im_mask then cv::bitwise_xor(im_mask, obj_mask)
  //     (reference :57-71), cancelling matched regions so points come
  //     from the UNMATCHED remainder of the object mask.  (The reference
  //     scans each rect from the image origin — a bug — here regions are
  //     rect-local.)
  // Both start from the Otsu-thresholded object mask.  Matched regions
  // are COPIED into a scratch mask (assignment is idempotent where
  // rects overlap — a per-rect XOR would flip overlap pixels twice;
  // the reference likewise copies regions then applies ONE global
  // cv::bitwise_xor), then combined per the polarity.
  int o_thresh = tpufcn::otsu_threshold(mask, n);
  std::vector<uint8_t> matched(n, 0);
  for (const Rect& orc : orects) {
    bool hit = false;
    for (const Rect& prc : prects) {
      if (tpufcn::rect_iou(orc, prc) > 0.0) { hit = true; break; }
    }
    if (!hit) continue;
    for (int y = orc.y; y < orc.y + orc.h; ++y) {
      for (int x = orc.x; x < orc.x + orc.w; ++x) {
        int idx = y * w + x;
        matched[idx] = mask[idx] > o_thresh ? 255 : 0;
      }
    }
  }
  std::vector<uint8_t> fused(n, 0);
  if (keep_matched) {
    fused = matched;
  } else {
    for (int i = 0; i < n; ++i) {
      uint8_t obj = mask[i] > o_thresh ? 255 : 0;
      fused[i] = obj ^ matched[i];  // the reference's single bitwise_xor
    }
  }

  // gather organized-cloud points under the fused mask (reference
  // :77-92: index = x + y*cols) and cluster them
  std::vector<float> pts;
  std::vector<int> src_index;
  pts.reserve(n / 8 * 3);
  for (int i = 0; i < n; ++i) {
    labels_out[i] = -1;
    if (!fused[i]) continue;
    const float* p = cloud + i * 3;
    if (std::isfinite(p[0]) && std::isfinite(p[1]) && std::isfinite(p[2])) {
      pts.insert(pts.end(), {p[0], p[1], p[2]});
      src_index.push_back(i);
    }
  }
  if (pts.empty()) return 0;
  std::vector<int> labels(src_index.size(), -1);
  int k = tpufcn::euclidean_cluster(pts.data(),
                                    static_cast<int>(src_index.size()),
                                    cluster_tol, min_cluster, max_cluster,
                                    labels.data());
  for (size_t i = 0; i < src_index.size(); ++i)
    labels_out[src_index[i]] = labels[i];
  return k;
}

}  // extern "C"
