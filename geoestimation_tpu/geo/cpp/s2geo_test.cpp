// Sanitizer test driver for the batch S2 kernels (s2geo.cpp).
//
// Built and run under -fsanitize=address and -fsanitize=thread by
// `make check-sanitized` (SURVEY.md §5 race detection; exercised from
// pytest via tests/test_sanitized.py). Checks the canonical vectors from
// tests/test_s2_groundtruth.py, then stresses the multithreaded batch
// entry points and verifies they are deterministic across thread counts.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void s2_latlng_to_cell_id(const double* lat, const double* lng, int64_t n,
                          uint64_t* out, int n_threads);
void s2_parent_at_level(const uint64_t* ids, int64_t n, int level,
                        uint64_t* out, int n_threads);
void s2_cell_level(const uint64_t* ids, int64_t n, int32_t* out,
                   int n_threads);
void s2_cell_id_to_latlng(const uint64_t* ids, int64_t n, double* lat,
                          double* lng, int n_threads);
}

#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,   \
                   __LINE__, #cond);                                  \
      std::exit(1);                                                   \
    }                                                                 \
  } while (0)

int main() {
  // Canonical pins (provenance in tests/test_s2_groundtruth.py).
  struct Vec {
    double lat, lng;
    uint64_t id;
  };
  const Vec vectors[] = {
      {0.0, 0.0, 0x1000000000000001ull},
      {0.0, 90.0, 0x3000000000000001ull},
      {90.0, 0.0, 0x5000000000000001ull},
      {0.0, -180.0, 0x7000000000000001ull},
      {0.0, -90.0, 0x9000000000000001ull},
      {-90.0, 0.0, 0xb000000000000001ull},
      {48.8566, 2.3522, 0x47e66e1d8f8be23bull},   // paris
      {40.7128, -74.0060, 0x89c25a220cf80969ull},  // nyc
      {51.5074, -0.1278, 0x487604ce36748fa9ull},   // london
      {-33.8688, 151.2093, 0x6b12ae3ff6290055ull},  // sydney
  };
  for (const Vec& v : vectors) {
    uint64_t id = 0;
    s2_latlng_to_cell_id(&v.lat, &v.lng, 1, &id, 1);
    CHECK(id == v.id);
  }

  // Multithreaded batch == single-threaded batch, bit for bit.
  const int64_t n = 200000;
  std::mt19937_64 gen(7);
  std::uniform_real_distribution<double> ulat(-89.9, 89.9);
  std::uniform_real_distribution<double> ulng(-180.0, 180.0);
  std::vector<double> lat(n), lng(n);
  for (int64_t i = 0; i < n; ++i) {
    lat[i] = ulat(gen);
    lng[i] = ulng(gen);
  }
  std::vector<uint64_t> ids1(n), ids8(n);
  s2_latlng_to_cell_id(lat.data(), lng.data(), n, ids1.data(), 1);
  s2_latlng_to_cell_id(lat.data(), lng.data(), n, ids8.data(), 8);
  for (int64_t i = 0; i < n; ++i) CHECK(ids1[i] == ids8[i]);

  // Leaf level, parent level, containment ordering.
  std::vector<int32_t> levels(n);
  s2_cell_level(ids8.data(), n, levels.data(), 8);
  for (int64_t i = 0; i < n; ++i) CHECK(levels[i] == 30);

  std::vector<uint64_t> parents(n);
  for (int level : {0, 5, 12, 29}) {
    s2_parent_at_level(ids8.data(), n, level, parents.data(), 8);
    s2_cell_level(parents.data(), n, levels.data(), 8);
    for (int64_t i = 0; i < n; ++i) {
      CHECK(levels[i] == level);
      // parent range must contain the leaf
      const uint64_t lsb = parents[i] & (~parents[i] + 1);
      CHECK(ids8[i] >= parents[i] - lsb + 1);
      CHECK(ids8[i] <= parents[i] + lsb - 1);
    }
  }

  // Cell centers map back into the cell (level 12).
  s2_parent_at_level(ids8.data(), n, 12, parents.data(), 8);
  std::vector<double> clat(n), clng(n);
  s2_cell_id_to_latlng(parents.data(), n, clat.data(), clng.data(), 8);
  std::vector<uint64_t> back(n), back_parent(n);
  s2_latlng_to_cell_id(clat.data(), clng.data(), n, back.data(), 8);
  s2_parent_at_level(back.data(), n, 12, back_parent.data(), 8);
  for (int64_t i = 0; i < n; ++i) CHECK(back_parent[i] == parents[i]);

  std::puts("s2geo_test OK");
  return 0;
}
