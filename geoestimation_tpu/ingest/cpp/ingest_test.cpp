// Sanitizer test driver for the threaded JPEG ingest kernel (ingest.cpp).
//
// Built and run under -fsanitize=address and -fsanitize=thread by
// `make check-sanitized` (SURVEY.md §5; exercised from pytest via
// tests/test_sanitized.py). argv[1] must point at a real JPEG file (the
// Makefile target generates one with PIL). The driver mixes valid,
// corrupt, and empty blobs across a large concurrent batch — the layout
// that would expose data races in the work-stealing loop or buffer
// aliasing between worker threads — and checks that two concurrent runs
// are bit-identical.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" int geoingest_decode_batch(const char** blobs, const size_t* lens,
                                      int n, int resize_to, int base_size,
                                      uint8_t* out, uint8_t* ok,
                                      int n_threads);
extern "C" int geoingest_decode_batch_ex(const char** blobs,
                                         const size_t* lens, int n,
                                         int resize_to, int base_size,
                                         uint8_t* out, uint8_t* ok,
                                         int n_threads, int flags);

#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,   \
                   __LINE__, #cond);                                  \
      std::exit(1);                                                   \
    }                                                                 \
  } while (0)

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <test.jpg>\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  CHECK(f != nullptr);
  std::fseek(f, 0, SEEK_END);
  const long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string jpeg(static_cast<size_t>(sz), '\0');
  CHECK(std::fread(jpeg.data(), 1, jpeg.size(), f) == jpeg.size());
  std::fclose(f);

  std::string corrupt = jpeg.substr(0, jpeg.size() / 3);
  std::string garbage(4096, '\x5a');

  const int n = 96, resize_to = 64, base = 64;
  std::vector<const char*> blobs(n);
  std::vector<size_t> lens(n);
  for (int i = 0; i < n; ++i) {
    switch (i % 4) {
      case 0:
      case 1:
        blobs[i] = jpeg.data();
        lens[i] = jpeg.size();
        break;
      case 2:
        blobs[i] = corrupt.data();
        lens[i] = corrupt.size();
        break;
      default:
        blobs[i] = garbage.data();
        lens[i] = 0;  // empty blob
    }
  }

  const size_t img = static_cast<size_t>(base) * base * 3;
  std::vector<uint8_t> out_a(n * img, 0xee), ok_a(n, 0xee);
  std::vector<uint8_t> out_b(n * img, 0x11), ok_b(n, 0x11);

  const int good_a = geoingest_decode_batch(
      blobs.data(), lens.data(), n, resize_to, base, out_a.data(),
      ok_a.data(), 8);
  const int good_b = geoingest_decode_batch(
      blobs.data(), lens.data(), n, resize_to, base, out_b.data(),
      ok_b.data(), 3);

  // Valid JPEGs must decode; empty blobs must fail; truncated JPEGs are
  // implementation-defined (libjpeg fills missing scanlines after a
  // premature-EOF warning) but must be consistent across runs.
  CHECK(good_a >= n / 2);
  CHECK(good_b == good_a);
  for (int i = 0; i < n; ++i) {
    if (i % 4 <= 1) CHECK(ok_a[i] == 1);
    if (i % 4 == 3) CHECK(ok_a[i] == 0);
    CHECK(ok_a[i] == ok_b[i]);
  }
  // Thread-count independence: outputs bit-identical (failed slots are
  // zeroed by the kernel, so the whole buffer must match).
  CHECK(std::memcmp(out_a.data(), out_b.data(), out_a.size()) == 0);

  // A decoded slot must contain non-zero pixels (real decode happened).
  bool nonzero = false;
  for (size_t k = 0; k < img && !nonzero; ++k) nonzero = out_a[k] != 0;
  CHECK(nonzero);

  // Scaled-decode path (flags bit 0): same ok pattern, thread-count
  // independent, under the same mixed valid/corrupt/empty concurrency.
  std::vector<uint8_t> out_c(n * img, 0x22), ok_c(n, 0x22);
  std::vector<uint8_t> out_d(n * img, 0x33), ok_d(n, 0x33);
  const int good_c = geoingest_decode_batch_ex(
      blobs.data(), lens.data(), n, resize_to, base, out_c.data(),
      ok_c.data(), 8, 1);
  const int good_d = geoingest_decode_batch_ex(
      blobs.data(), lens.data(), n, resize_to, base, out_d.data(),
      ok_d.data(), 3, 1);
  CHECK(good_c == good_a);
  CHECK(good_d == good_c);
  for (int i = 0; i < n; ++i) CHECK(ok_c[i] == ok_a[i] && ok_d[i] == ok_c[i]);
  CHECK(std::memcmp(out_c.data(), out_d.data(), out_c.size()) == 0);

  std::puts("ingest_test OK");
  return 0;
}
