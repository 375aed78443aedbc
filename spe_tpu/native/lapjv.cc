// Exact rectangular linear assignment (Jonker-Volgenant style shortest
// augmenting path), used as the host-side oracle / fallback for the
// on-device auction solver in spe_tpu/ops/assignment.py.
//
// Solves min-cost assignment of n rows to m columns (n <= m).
// Replaces the reference's scipy.optimize.linear_sum_assignment dependency
// (reference models/matcher.py:14,86) with an in-tree native solver.
//
// Build: g++ -O2 -shared -fPIC -o liblapjv.so lapjv.cc

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// cost: row-major (n x m). out_col2row semantics: for row i, out[i] = column
// assigned. Returns total cost, or NaN if infeasible.
double lapjv_rect(int n, int m, const double* cost, int* out_row2col) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(n, 0.0), v(m, 0.0);
  std::vector<int> col4row(n, -1), row4col(m, -1);
  std::vector<double> shortest(m);
  std::vector<int> path(m);
  std::vector<char> visited(m);

  for (int cur_row = 0; cur_row < n; ++cur_row) {
    double min_val = 0.0;
    int i = cur_row;
    int sink = -1;
    std::fill(shortest.begin(), shortest.end(), INF);
    std::fill(visited.begin(), visited.end(), 0);
    std::fill(path.begin(), path.end(), -1);

    while (sink == -1) {
      double lowest = INF;
      int index = -1;
      for (int j = 0; j < m; ++j) {
        if (visited[j]) continue;
        double r = min_val + cost[(size_t)i * m + j] - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          path[j] = i;
        }
        // prefer unassigned columns on ties so paths terminate sooner
        if (shortest[j] < lowest ||
            (shortest[j] == lowest && row4col[j] == -1)) {
          lowest = shortest[j];
          index = j;
        }
      }
      min_val = lowest;
      if (index == -1 || min_val == INF) {
        return std::nan("");  // infeasible
      }
      visited[index] = 1;
      if (row4col[index] == -1) {
        sink = index;
      } else {
        i = row4col[index];
      }
    }

    // update dual variables
    u[cur_row] += min_val;
    for (int k = 0; k < n; ++k) {
      if (k != cur_row && col4row[k] != -1 && visited[col4row[k]]) {
        u[k] += min_val - shortest[col4row[k]];
      }
    }
    for (int j = 0; j < m; ++j) {
      if (visited[j]) {
        v[j] -= min_val - shortest[j];
      }
    }

    // augment along the alternating path back from the sink
    int j = sink;
    while (true) {
      int pi = path[j];
      row4col[j] = pi;
      int tmp = col4row[pi];
      col4row[pi] = j;
      if (pi == cur_row) break;
      j = tmp;
    }
  }

  double total = 0.0;
  for (int k = 0; k < n; ++k) {
    out_row2col[k] = col4row[k];
    total += cost[(size_t)k * m + col4row[k]];
  }
  return total;
}

}  // extern "C"
