// Host-compilation shim for tiny-cuda-nn device headers (golden vectors)
#pragma once
#include <cstdint>
#include <cmath>
#define __host__
#define __device__
#define __forceinline__ inline
struct half {
    uint16_t x;
    half() = default;
    inline half(float v);
    inline operator float() const;
};
inline float __half2float(half h) {
    uint32_t sign = (h.x >> 15) & 1, exp = (h.x >> 10) & 0x1f, man = h.x & 0x3ff;
    uint32_t f;
    if (exp == 0) { if (man == 0) f = sign << 31; else { exp = 127 - 15 + 1; while (!(man & 0x400)) { man <<= 1; --exp; } man &= 0x3ff; f = (sign << 31) | (exp << 23) | (man << 13); } }
    else if (exp == 31) f = (sign << 31) | 0x7f800000u | (man << 13);
    else f = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
    float out; __builtin_memcpy(&out, &f, 4); return out;
}
inline half __float2half(float v) {
    uint32_t f; __builtin_memcpy(&f, &v, 4);
    uint32_t sign = (f >> 31) & 1, exp = (f >> 23) & 0xff, man = f & 0x7fffff;
    uint16_t h;
    if (exp == 255) h = (sign << 15) | 0x7c00 | (man ? 0x200 : 0);
    else if ((int)exp - 127 + 15 >= 31) h = (sign << 15) | 0x7c00;
    else if ((int)exp - 127 + 15 <= 0) {
        if ((int)exp - 127 + 15 < -10) h = sign << 15;
        else { man |= 0x800000; int shift = 14 - ((int)exp - 127); uint32_t m = man >> shift; if ((man >> (shift - 1)) & 1) m += 1; h = (sign << 15) | m; }
    } else {
        uint32_t m = man >> 13; if ((man >> 12) & 1) { m += 1; if (m == 0x400) { m = 0; exp += 1; } }
        h = (sign << 15) | (((exp - 127 + 15) & 0x1f) << 10) | m;
    }
    half r; r.x = h; return r;
}
inline half operator+(half a, half b){ return __float2half(__half2float(a)+__half2float(b)); }
inline half::operator float() const { return __half2float(*this); }
inline half::half(float v) { *this = __float2half(v); }
struct Dim3Stub { unsigned x = 0, y = 0, z = 0; };
static Dim3Stub threadIdx, blockIdx, blockDim, gridDim;

#define __global__ static
inline float normcdff(float x){ return 0.5f * erfcf(-x * 0.70710678118654752440f); }
inline float rsqrtf(float x){ return 1.0f / sqrtf(x); }

