#include <cstdio>
#include <cstdlib>
#include <vector>
#include <cstring>
extern "C" {
  void* hevcdec_create();
  void hevcdec_destroy(void*);
  void hevcdec_enable_recon(void*, int);
  int hevcdec_decode(void*, const unsigned char*, long);
}
int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) return 1;
  fclose(f);
  int reps = argc > 2 ? atoi(argv[2]) : 3;
  for (int r = 0; r < reps; r++) {
    void* h = hevcdec_create();
    hevcdec_enable_recon(h, 1);
    int np = hevcdec_decode(h, buf.data(), n);
    fprintf(stderr, "rep %d: %d pics\n", r, np);
    hevcdec_destroy(h);
  }
  return 0;
}
