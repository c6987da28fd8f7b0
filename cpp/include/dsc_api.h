// dsc_tpu C++ user API — header-only RAII wrapper over the C ABI.
//
// Rebuild of the reference C++ front end (reference dsc/api/dsc_api.h):
// dsc::tensor<T> with value semantics (deep copy / move), variadic
// get/set with slices, arithmetic operators incl. scalar overloads, and
// the free-function op set. Shares the runtime (context, plan cache,
// tracing) with Python through the embedded-interpreter shim.

#pragma once

#include <algorithm>
#include <complex>
#include <cstring>
#include <initializer_list>
#include <stdexcept>
#include <string>
#include <vector>

#include "dsc.h"

// slice helpers (reference dsc_api.h:15-21)
#define DSC_SLICE_ALL       (dsc::slice{DSC_NONE, DSC_NONE, DSC_NONE})
#define DSC_SLICE_IDX(i)    (dsc::slice{(i), (i), (i), true})
#define DSC_SLICE_ALL_STEP(s) (dsc::slice{DSC_NONE, DSC_NONE, (s)})
#define DSC_SLICE_FROM(a)   (dsc::slice{(a), DSC_NONE, DSC_NONE})
#define DSC_SLICE_TO(b)     (dsc::slice{DSC_NONE, (b), DSC_NONE})
#define DSC_SLICE_RANGE(a, b) (dsc::slice{(a), (b), DSC_NONE})

namespace dsc {

struct slice {
    int start = DSC_NONE;
    int stop = DSC_NONE;
    int step = DSC_NONE;
    bool is_index = false;
};

inline void init(size_t nb) {
    // 90/10 main/scratch split (reference dsc_api.h:28-34)
    const size_t main_mem = (size_t)(nb * 0.9);
    dsc_ctx_init(main_mem, nb - main_mem);
}

inline std::string last_error() {
    char buf[1024];
    dsc_last_error(buf, sizeof(buf));
    return buf;
}

namespace detail {
template <typename T> struct dtype_of;
template <> struct dtype_of<float> {
    static constexpr dsc_dtype value = DSC_F32;
};
template <> struct dtype_of<double> {
    static constexpr dsc_dtype value = DSC_F64;
};
template <> struct dtype_of<std::complex<float>> {
    static constexpr dsc_dtype value = DSC_C32;
};
template <> struct dtype_of<std::complex<double>> {
    static constexpr dsc_dtype value = DSC_C64;
};

inline dsc_tensor_h check(dsc_tensor_h h) {
    if (h == DSC_INVALID) throw std::runtime_error("dsc: " + last_error());
    return h;
}

template <typename T>
inline void scalar_parts(T v, double &re, double &im, int &is_c) {
    if constexpr (std::is_same_v<T, std::complex<float>> ||
                  std::is_same_v<T, std::complex<double>>) {
        re = (double) v.real();
        im = (double) v.imag();
        is_c = 1;
    } else {
        re = (double) v;
        im = 0;
        is_c = 0;
    }
}
}  // namespace detail

template <typename T = float>
class tensor {
  public:
    tensor() = default;

    explicit tensor(dsc_tensor_h h) : h_(detail::check(h)) {}

    tensor(std::initializer_list<int> shape_list, const T *data = nullptr) {
        std::vector<int> shape(shape_list);
        if (data) {
            h_ = detail::check(dsc_tensor_from_buffer(
                data, detail::dtype_of<T>::value, (int) shape.size(),
                shape.data()));
        } else {
            h_ = detail::check(dsc_full((int) shape.size(), shape.data(), 0, 0,
                                        detail::dtype_of<T>::value));
        }
    }

    tensor(const std::vector<T> &values, std::initializer_list<int> shape_list)
        : tensor(shape_list, values.data()) {}

    // deep copy (reference tensor copy semantics, dsc_api.h:56-70)
    tensor(const tensor &other) {
        if (other.h_ != DSC_INVALID) {
            std::vector<T> buf = other.to_vector();
            auto shape = other.shape();
            h_ = detail::check(dsc_tensor_from_buffer(
                buf.data(), detail::dtype_of<T>::value, (int) shape.size(),
                shape.data()));
        }
    }

    tensor &operator=(const tensor &other) {
        if (this != &other) {
            tensor tmp(other);
            std::swap(h_, tmp.h_);
        }
        return *this;
    }

    tensor(tensor &&other) noexcept : h_(other.h_) { other.h_ = DSC_INVALID; }

    tensor &operator=(tensor &&other) noexcept {
        std::swap(h_, other.h_);
        return *this;
    }

    ~tensor() {
        if (h_ != DSC_INVALID) dsc_tensor_free(h_);
    }

    dsc_tensor_h handle() const { return h_; }

    int ndim() const { return dsc_tensor_ndim(h_); }

    std::vector<int> shape() const {
        int dims[DSC_MAX_DIMS];
        int n = dsc_tensor_shape(h_, dims);
        return std::vector<int>(dims, dims + n);
    }

    int dim(int i) const {
        auto s = shape();
        return s[i < 0 ? (int) s.size() + i : i];
    }

    int64_t size() const { return dsc_tensor_ne(h_); }

    std::vector<T> to_vector() const {
        std::vector<T> out((size_t) size());
        if (dsc_tensor_to_buffer(h_, out.data(), out.size() * sizeof(T)) < 0)
            throw std::runtime_error("dsc: " + last_error());
        return out;
    }

    // -- element / slice access -------------------------------------------

    template <typename... Idx>
    T get(Idx... idx) const {
        const int n = sizeof...(Idx);
        int starts[] = {(int) idx...};
        int stops[n], steps[n], is_idx[n];
        for (int i = 0; i < n; ++i) {
            stops[i] = starts[i];
            steps[i] = starts[i];
            is_idx[i] = 1;
        }
        tensor<T> r(dsc_get_slice(h_, n, starts, stops, steps, is_idx));
        return r.to_vector()[0];
    }

    tensor<T> get_slice(std::initializer_list<slice> slices) const {
        std::vector<int> starts, stops, steps, is_idx;
        for (const auto &s : slices) {
            starts.push_back(s.start);
            stops.push_back(s.stop);
            steps.push_back(s.step);
            is_idx.push_back(s.is_index ? 1 : 0);
        }
        return tensor<T>(dsc_get_slice(h_, (int) starts.size(), starts.data(),
                                       stops.data(), steps.data(),
                                       is_idx.data()));
    }

    void set_slice(std::initializer_list<slice> slices, const tensor<T> &v) {
        std::vector<int> starts, stops, steps, is_idx;
        for (const auto &s : slices) {
            starts.push_back(s.start);
            stops.push_back(s.stop);
            steps.push_back(s.step);
            is_idx.push_back(s.is_index ? 1 : 0);
        }
        if (dsc_set_slice(h_, v.handle(), (int) starts.size(), starts.data(),
                          stops.data(), steps.data(), is_idx.data()) != 0)
            throw std::runtime_error("dsc: " + last_error());
    }

  private:
    dsc_tensor_h h_ = DSC_INVALID;
};

// -- operators (reference dsc_api.h:148-189) --------------------------------

#define DSC_DEFINE_OP(OP, CNAME)                                              \
    template <typename T>                                                     \
    tensor<T> operator OP(const tensor<T> &a, const tensor<T> &b) {           \
        return tensor<T>(dsc_##CNAME(a.handle(), b.handle()));                \
    }                                                                         \
    template <typename T, typename S>                                         \
    tensor<T> operator OP(const tensor<T> &a, S s) {                          \
        double re, im;                                                        \
        int is_c;                                                             \
        detail::scalar_parts(s, re, im, is_c);                                \
        return tensor<T>(dsc_##CNAME##_scalar(a.handle(), re, im, is_c, 0));  \
    }                                                                         \
    template <typename T, typename S>                                         \
    tensor<T> operator OP(S s, const tensor<T> &a) {                          \
        double re, im;                                                        \
        int is_c;                                                             \
        detail::scalar_parts(s, re, im, is_c);                                \
        return tensor<T>(dsc_##CNAME##_scalar(a.handle(), re, im, is_c, 1));  \
    }

DSC_DEFINE_OP(+, add)
DSC_DEFINE_OP(-, sub)
DSC_DEFINE_OP(*, mul)
DSC_DEFINE_OP(/, div)
#undef DSC_DEFINE_OP

// in-place forms (reference dsc_api.h:148-189 includes +=, -=, *=, /=);
// result rebinds the left tensor's handle (move assignment frees the old)
#define DSC_DEFINE_INPLACE_OP(OP)                                             \
    template <typename T>                                                     \
    tensor<T> &operator OP##=(tensor<T> &a, const tensor<T> &b) {             \
        a = a OP b;                                                           \
        return a;                                                             \
    }                                                                         \
    template <typename T, typename S>                                         \
    tensor<T> &operator OP##=(tensor<T> &a, S s) {                            \
        a = a OP s;                                                           \
        return a;                                                             \
    }

DSC_DEFINE_INPLACE_OP(+)
DSC_DEFINE_INPLACE_OP(-)
DSC_DEFINE_INPLACE_OP(*)
DSC_DEFINE_INPLACE_OP(/)
#undef DSC_DEFINE_INPLACE_OP

template <typename T>
tensor<T> pow(const tensor<T> &a, const tensor<T> &b) {
    return tensor<T>(dsc_pow(a.handle(), b.handle()));
}

template <typename T, typename S>
tensor<T> pow(const tensor<T> &a, S s) {
    double re, im;
    int is_c;
    detail::scalar_parts(s, re, im, is_c);
    return tensor<T>(dsc_pow_scalar(a.handle(), re, im, is_c, 0));
}

// -- free functions (reference dsc_api.h:259-343) -----------------------------

template <typename T = float>
tensor<T> arange(int n) {
    return tensor<T>(dsc_arange(n, detail::dtype_of<T>::value));
}

template <typename T = float>
tensor<T> randn(std::initializer_list<int> shape_list) {
    std::vector<int> shape(shape_list);
    return tensor<T>(
        dsc_randn((int) shape.size(), shape.data(), detail::dtype_of<T>::value));
}

#define DSC_DEFINE_UNARY(NAME)                          \
    template <typename T>                               \
    tensor<T> NAME(const tensor<T> &x) {                \
        return tensor<T>(dsc_##NAME(x.handle()));       \
    }

DSC_DEFINE_UNARY(cos)
DSC_DEFINE_UNARY(sin)
DSC_DEFINE_UNARY(sinc)
DSC_DEFINE_UNARY(exp)
DSC_DEFINE_UNARY(sqrt)
DSC_DEFINE_UNARY(i0)
#undef DSC_DEFINE_UNARY

template <typename T>
tensor<T> clip(const tensor<T> &x, double lo, double hi) {
    return tensor<T>(dsc_clip(x.handle(), lo, hi, 1, 1));
}

template <typename T>
tensor<T> sum(const tensor<T> &x, int axis = -1, bool keepdims = true) {
    return tensor<T>(dsc_sum(x.handle(), axis, keepdims ? 1 : 0));
}

template <typename T>
tensor<T> transpose(const tensor<T> &x, std::initializer_list<int> axes = {}) {
    std::vector<int> ax(axes);
    return tensor<T>(dsc_transpose(x.handle(), (int) ax.size(), ax.data()));
}

template <typename T>
tensor<T> reshape(const tensor<T> &x, std::initializer_list<int> shape_list) {
    std::vector<int> shape(shape_list);
    return tensor<T>(dsc_reshape(x.handle(), (int) shape.size(), shape.data()));
}

template <typename T>
tensor<T> concat(const tensor<T> &a, const tensor<T> &b, int axis = 0) {
    dsc_tensor_h hs[2] = {a.handle(), b.handle()};
    return tensor<T>(dsc_concat(2, hs, axis, axis == DSC_NONE ? 1 : 0));
}

// fft family: complex<T> in/out for fft/ifft; rfft: real -> complex;
// irfft: complex -> real (reference dsc_api.h fft surface)
inline tensor<std::complex<float>> fft(const tensor<std::complex<float>> &x,
                                       int n = -1, int axis = -1) {
    return tensor<std::complex<float>>(dsc_fft(x.handle(), n, axis));
}

inline tensor<std::complex<float>> ifft(const tensor<std::complex<float>> &x,
                                        int n = -1, int axis = -1) {
    return tensor<std::complex<float>>(dsc_ifft(x.handle(), n, axis));
}

inline tensor<std::complex<float>> rfft(const tensor<float> &x, int n = -1,
                                        int axis = -1) {
    return tensor<std::complex<float>>(dsc_rfft(x.handle(), n, axis));
}

inline tensor<float> irfft(const tensor<std::complex<float>> &x, int n = -1,
                           int axis = -1) {
    return tensor<float>(dsc_irfft(x.handle(), n, axis));
}

inline tensor<std::complex<double>> rfft(const tensor<double> &x, int n = -1,
                                         int axis = -1) {
    return tensor<std::complex<double>>(dsc_rfft(x.handle(), n, axis));
}

inline tensor<double> irfft(const tensor<std::complex<double>> &x, int n = -1,
                            int axis = -1) {
    return tensor<double>(dsc_irfft(x.handle(), n, axis));
}

// 2-D transforms (dsc_tpu extension; np.fft.*2 semantics + pow2 rule)
inline tensor<std::complex<float>> fft2(const tensor<std::complex<float>> &x,
                                        int n0 = -1, int n1 = -1,
                                        int ax0 = -2, int ax1 = -1) {
    return tensor<std::complex<float>>(dsc_fft2(x.handle(), n0, n1, ax0, ax1));
}

inline tensor<std::complex<float>> ifft2(const tensor<std::complex<float>> &x,
                                         int n0 = -1, int n1 = -1,
                                         int ax0 = -2, int ax1 = -1) {
    return tensor<std::complex<float>>(
        dsc_ifft2(x.handle(), n0, n1, ax0, ax1));
}

inline tensor<std::complex<float>> rfft2(const tensor<float> &x, int n0 = -1,
                                         int n1 = -1, int ax0 = -2,
                                         int ax1 = -1) {
    return tensor<std::complex<float>>(
        dsc_rfft2(x.handle(), n0, n1, ax0, ax1));
}

inline tensor<float> irfft2(const tensor<std::complex<float>> &x, int n0 = -1,
                            int n1 = -1, int ax0 = -2, int ax1 = -1) {
    return tensor<float>(dsc_irfft2(x.handle(), n0, n1, ax0, ax1));
}

// window generators (dsc_tpu extension; np window semantics)
template <typename T = float>
tensor<T> hanning(int n) {
    return tensor<T>(dsc_window("hanning", n, 0.0, detail::dtype_of<T>::value));
}

template <typename T = float>
tensor<T> hamming(int n) {
    return tensor<T>(dsc_window("hamming", n, 0.0, detail::dtype_of<T>::value));
}

template <typename T = float>
tensor<T> blackman(int n) {
    return tensor<T>(
        dsc_window("blackman", n, 0.0, detail::dtype_of<T>::value));
}

template <typename T = float>
tensor<T> kaiser(int n, double beta) {
    return tensor<T>(dsc_window("kaiser", n, beta, detail::dtype_of<T>::value));
}

}  // namespace dsc
