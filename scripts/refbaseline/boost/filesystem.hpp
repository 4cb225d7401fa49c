// Shim: the reference (BimocqSolver2D.h:16 / .cpp:2338-2371) uses Boost only for
// boost::filesystem::create_directories. This environment has no Boost; map the
// one symbol onto std::filesystem so the reference solver compiles unmodified
// for baseline measurement (scripts/refbaseline/main_bench.cpp).
#pragma once
#include <filesystem>
#include <string>
namespace boost {
namespace filesystem {
inline bool create_directories(const std::string &p) {
    return std::filesystem::create_directories(p);
}
}  // namespace filesystem
}  // namespace boost
