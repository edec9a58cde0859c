// minimal boost::format shim (printf-style sequential substitution)
#pragma once
#include <cassert>
#include <cctype>
#include <cstdio>
#include <optional>
#include <sstream>
#include <string>
#include <type_traits>

namespace boost {

template <class T> using optional = std::optional<T>;

class format {
    std::string fmt_;

    template <class T>
    static void render(char* buf, size_t n, std::string spec, const T& v) {
        if constexpr (std::is_integral_v<T>) {
            spec.pop_back();
            spec += "lld";
            snprintf(buf, n, spec.c_str(), (long long)v);
        } else if constexpr (std::is_floating_point_v<T>) {
            char c = spec.back();
            if (c == 'd' || c == 'i') { spec.pop_back(); spec += "f"; }
            snprintf(buf, n, spec.c_str(), (double)v);
        } else {
            std::ostringstream os;
            os << v;
            snprintf(buf, n, "%s", os.str().c_str());
        }
    }

public:
    explicit format(const std::string& f) : fmt_(f) {}
    template <class T> format& operator%(const T& v) {
        for (size_t i = 0; i < fmt_.size(); ++i) {
            if (fmt_[i] != '%') continue;
            if (i + 1 < fmt_.size() && fmt_[i + 1] == '%') { ++i; continue; }
            size_t j = i + 1;
            while (j < fmt_.size() &&
                   !std::isalpha((unsigned char)fmt_[j])) ++j;
            if (j >= fmt_.size()) break;
            char buf[512];
            render(buf, sizeof buf, fmt_.substr(i, j - i + 1), v);
            fmt_ = fmt_.substr(0, i) + buf + fmt_.substr(j + 1);
            return *this;
        }
        return *this;
    }
    std::string str() const { return fmt_; }
    operator std::string() const { return fmt_; }
};
inline std::string str(const format& f) { return f.str(); }

}  // namespace boost

#ifndef BOOST_ASSERT_MSG
#define BOOST_ASSERT_MSG(cond, msg) assert((cond) && (msg))
#endif
