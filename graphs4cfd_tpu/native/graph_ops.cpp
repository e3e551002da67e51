// Native host-side graph-construction kernels.
//
// TPU-native counterpart of the compiled primitives the reference leans on
// (torch_cluster's C++/CUDA knn_graph / knn and the serial Guillard sweep in
// /root/reference/graphs4cfd/transforms/mugs.py:26-29).  These run in the
// data pipeline on CPU; exposed through a plain C ABI and loaded via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC graph_ops.cpp -o libgraph_ops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// Exact k-NN: for each query row, the k nearest rows of x (L2), ordered by
// ascending distance with ties broken by index.  exclude_self assumes
// queries == x and skips the identical index.
void knn_neighbors(const double* x, int64_t n, const double* q, int64_t m,
                   int64_t dim, int64_t k, int32_t exclude_self,
                   int32_t* out /* [m*k] */) {
  std::vector<std::pair<double, int64_t>> heap;  // max-heap of size k
  for (int64_t i = 0; i < m; ++i) {
    heap.clear();
    const double* qi = q + i * dim;
    for (int64_t j = 0; j < n; ++j) {
      if (exclude_self && j == i) continue;
      const double* xj = x + j * dim;
      double d = 0.0;
      for (int64_t d_ = 0; d_ < dim; ++d_) {
        double t = qi[d_] - xj[d_];
        d += t * t;
      }
      if ((int64_t)heap.size() < k) {
        heap.emplace_back(d, j);
        std::push_heap(heap.begin(), heap.end());
      } else if (d < heap.front().first ||
                 (d == heap.front().first && j < heap.front().second)) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d, j};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int64_t t = 0; t < k; ++t) out[i * k + t] = (int32_t)heap[t].second;
  }
}

// Guillard node-nested coarsening: greedy sweep in node order; every node
// still marked coarse removes its k senders from the coarse set.
void guillard_coarsening(const int32_t* senders /* [num_nodes*k] */,
                         int64_t num_nodes, int64_t k,
                         uint8_t* coarse /* [num_nodes] */) {
  for (int64_t v = 0; v < num_nodes; ++v) coarse[v] = 1;
  for (int64_t v = 0; v < num_nodes; ++v) {
    if (coarse[v]) {
      for (int64_t j = 0; j < k; ++j) coarse[senders[v * k + j]] = 0;
    }
  }
}

}  // extern "C"
