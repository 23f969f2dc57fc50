// Native Fortran-binary field IO (int32 nx, int32 ny header + column-major
// f64 payload — the reference's format, part2_utils.jl:11-19).
//
// Exposed with a C ABI for ctypes (fpr_tpu/utils/native.py); the Python
// loader falls back to numpy when the shared library is absent.  The native
// path reads + transposes to row-major (ny, nx) in one pass.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success.  Probes the header only.
int fio_probe(const char* path, int32_t* nx, int32_t* ny) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    int32_t hdr[2];
    size_t got = std::fread(hdr, sizeof(int32_t), 2, f);
    std::fclose(f);
    if (got != 2) return 2;
    *nx = hdr[0];
    *ny = hdr[1];
    return 0;
}

// out must hold nx*ny doubles; written row-major (ny, nx): out[y*nx + x].
int fio_read(const char* path, double* out, int32_t nx, int32_t ny) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    if (std::fseek(f, 2 * sizeof(int32_t), SEEK_SET) != 0) {
        std::fclose(f);
        return 2;
    }
    // payload is column-major (nx, ny): element (x, y) at index y*nx + x —
    // which IS row-major (ny, nx); a straight read suffices.
    size_t n = static_cast<size_t>(nx) * ny;
    size_t got = std::fread(out, sizeof(double), n, f);
    std::fclose(f);
    return got == n ? 0 : 3;
}

int fio_write(const char* path, const double* data, int32_t nx, int32_t ny) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    int32_t hdr[2] = {nx, ny};
    size_t n = static_cast<size_t>(nx) * ny;
    int ok = std::fwrite(hdr, sizeof(int32_t), 2, f) == 2 &&
             std::fwrite(data, sizeof(double), n, f) == n;
    std::fclose(f);
    return ok ? 0 : 2;
}

}  // extern "C"
