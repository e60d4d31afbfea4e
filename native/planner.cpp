// Native execution planner: topological sort with cycle breaking.
//
// C++ implementation of the same observable semantics as
// srack_tpu/planner.py (which mirrors the reference planner,
// reference src/synth.rs:107-212): DFS from the output-last module list,
// per-visited-module BFS cycle probe, deletion of all back-edge entries,
// then first-fit emission of dependency-satisfied modules.
//
// The graph crosses the C boundary as flat arrays: per-module dependency
// lists (module indices, input-port order, duplicates preserved) in CSR
// form.  Exposed via ctypes from srack_tpu/native.py.

#include <cstdint>
#include <vector>
#include <unordered_set>
#include <algorithm>

namespace {

// BFS from `module`; returns the first node (visit order) whose dependency
// list contains `module`, or -1.
int is_loop(int module, const std::vector<std::vector<int>>& edges) {
  std::vector<int> to_search{module};
  std::vector<char> visited(edges.size(), 0);
  size_t cursor = 0;
  while (true) {
    // find first unvisited entry in to_search order
    int current = -1;
    for (size_t i = cursor; i < to_search.size(); ++i) {
      if (!visited[to_search[i]]) {
        current = to_search[i];
        if (i == cursor) ++cursor;
        break;
      }
    }
    if (current < 0) return -1;
    visited[current] = 1;
    for (int dep : edges[current]) {
      if (dep == module) return current;
      to_search.push_back(dep);
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of modules emitted into plan_out (== n on success),
// or -1 if broken_out capacity was exceeded.  broken pairs are
// (sink, src) index pairs; *n_broken_out receives the count.
int srack_plan_execution(int n, int output_idx,
                         const int* dep_offsets,  // length n+1
                         const int* deps,         // length dep_offsets[n]
                         int* plan_out,           // length n
                         int* broken_out,         // length 2*max_broken
                         int max_broken,
                         int* n_broken_out) {
  std::vector<std::vector<int>> edges(n);
  for (int m = 0; m < n; ++m) {
    edges[m].assign(deps + dep_offsets[m], deps + dep_offsets[m + 1]);
  }

  // Phase 2: DFS (stack, pop from end; output pushed last), breaking
  // cycles at each visited module (synth.rs:168-192 semantics).
  std::vector<int> to_search;
  to_search.reserve(n + 1);
  for (int m = 0; m < n; ++m) to_search.push_back(m);
  to_search.push_back(output_idx);
  std::vector<char> visited(n, 0);
  int n_broken = 0;
  while (!to_search.empty()) {
    int module = to_search.back();
    to_search.pop_back();
    if (visited[module]) continue;
    visited[module] = 1;
    for (int dep : edges[module]) to_search.push_back(dep);
    while (true) {
      int frm = is_loop(module, edges);
      if (frm < 0) break;
      auto& v = edges[frm];
      v.erase(std::remove(v.begin(), v.end(), module), v.end());
      if (n_broken >= max_broken) return -1;
      broken_out[2 * n_broken] = frm;
      broken_out[2 * n_broken + 1] = module;
      ++n_broken;
    }
  }
  *n_broken_out = n_broken;

  // Phase 3: first-fit emission (synth.rs:193-211).
  std::vector<char> emitted(n, 0);
  int emitted_count = 0;
  while (true) {
    int node = -1;
    for (int m = 0; m < n; ++m) {
      if (emitted[m]) continue;
      bool ready = true;
      for (int dep : edges[m]) {
        if (!emitted[dep]) { ready = false; break; }
      }
      if (ready) { node = m; break; }
    }
    if (node < 0) break;
    emitted[node] = 1;
    plan_out[emitted_count++] = node;
  }
  return emitted_count;
}

}  // extern "C"
