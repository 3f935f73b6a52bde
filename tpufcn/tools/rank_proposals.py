"""Training-data ranking / outlier rejection (SURVEY.md C14).

Mirrors reference scripts/boundary_adjustment/rank_object_models.py:
extract CNN codes per GT crop, DBSCAN-cluster them (eps 0.25, min 10 —
reference :186-206), build per-cluster KMeans(2) centroids feeding a
kNN model (:203-267), then walk the sequence comparing template /
previous / current codes with chi^2 and Bhattacharyya distances,
EMA-updating the template (rate 0.1, reference :117-179), and write the
filtered manifest (``train2.txt``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2 as cv
import numpy as np
from sklearn.cluster import DBSCAN, KMeans
from sklearn.neighbors import NearestNeighbors

from tpufcn.data.manifest import DetectionSample
from tpufcn.tools.features import CnnCodeExtractor, bhattacharyya, chi_square


class RankObjectProposals:
    def __init__(self,
                 extractor: Optional[CnnCodeExtractor] = None,
                 dbscan_eps: float = 0.25,
                 dbscan_min_samples: int = 10,
                 kmeans_k: int = 2,
                 ema_rate: float = 0.1,
                 distance_thresh: float = 0.5,
                 metric: str = "bhattacharyya",
                 imread=cv.imread):
        # metric: "bhattacharyya" or "chi_square".  The reference walk
        # uses cv.compareHist with CV_COMP_BHATTACHARYYA on its OpenCV-2
        # path and HISTCMP_CHISQR on OpenCV-3+ (rank_object_models.py:
        # 46-52); both are exposed, Bhattacharyya (bounded [0, 1], so
        # the 0.5 default threshold is meaningful) is the default.
        self.extractor = extractor or CnnCodeExtractor()
        self.dbscan_eps = dbscan_eps
        self.dbscan_min_samples = dbscan_min_samples
        self.kmeans_k = kmeans_k
        self.ema_rate = ema_rate
        self.distance_thresh = distance_thresh
        self.metric = {"bhattacharyya": bhattacharyya,
                       "chi_square": chi_square}[metric]
        self.imread = imread

    def codes_for(self, samples: Sequence[DetectionSample]) -> np.ndarray:
        crops = []
        for s in samples:
            img = self.imread(s.image_path)
            x, y, w, h = [int(v) for v in s.rects[0]]
            # clamp the origin INSIDE the frame (an out-of-frame rect
            # otherwise yields an empty crop and cv.resize aborts)
            x = min(max(x, 0), img.shape[1] - 1)
            y = min(max(y, 0), img.shape[0] - 1)
            w = max(min(w, img.shape[1] - x), 1)
            h = max(min(h, img.shape[0] - y), 1)
            crops.append(img[y:y + h, x:x + w])
        return self.extractor(crops)

    def cluster_data(self, codes: np.ndarray):
        """DBSCAN -> per-cluster KMeans centroids -> kNN index.

        Returns (cluster_labels, centroids, knn or None)."""
        labels = DBSCAN(eps=self.dbscan_eps,
                        min_samples=min(self.dbscan_min_samples,
                                        max(len(codes) - 1, 1)),
                        ).fit_predict(codes)
        centroids = []
        for c in sorted(set(labels) - {-1}):
            members = codes[labels == c]
            k = min(self.kmeans_k, len(members))
            km = KMeans(n_clusters=k, n_init=4, random_state=0).fit(members)
            centroids.extend(km.cluster_centers_)
        centroids = np.asarray(centroids)
        knn = None
        if len(centroids):
            knn = NearestNeighbors(
                n_neighbors=min(2, len(centroids))).fit(centroids)
        return labels, centroids, knn

    def rank(self, samples: Sequence[DetectionSample]) -> np.ndarray:
        """Boolean keep-mask over the sequence."""
        codes = self.codes_for(samples)
        _, centroids, knn = self.cluster_data(codes)

        keep = np.zeros(len(samples), bool)
        template = None
        prev = None
        for i, code in enumerate(codes):
            if template is None:
                template = code.copy()
                prev = code
                keep[i] = True
                continue
            d_t = self.metric(code, template)
            d_p = self.metric(code, prev)
            inlier = True
            if knn is not None:
                dist, _ = knn.kneighbors(code[None])
                inlier = bool(dist.min() < self.dbscan_eps * 2)
            ok = (min(d_t, d_p) < self.distance_thresh) and inlier
            keep[i] = ok
            if ok:
                # EMA template update (reference rate 0.1)
                template = ((1 - self.ema_rate) * template
                            + self.ema_rate * code)
                prev = code
        return keep

    def write_filtered(self, samples: Sequence[DetectionSample],
                       out_path: str,
                       one_based_labels: bool = True) -> int:
        from tpufcn.data.manifest import detection_line
        keep = self.rank(samples)
        n = 0
        with open(out_path, "w") as f:
            for s, ok in zip(samples, keep):
                if not ok:
                    continue
                f.write(detection_line(s.image_path, s.rects[0],
                                       s.labels[0], one_based_labels)
                        + "\n")
                n += 1
        return n
