// Baseline measurement driver: compiles the UNMODIFIED reference 2D solver
// (/root/reference/src/bimocq2D/BimocqSolver2D.cpp) and times advance() on the
// Taylor-vortex example-0 configuration (reference main.cpp:40-71), excluding
// all file output. Purpose: replace the previously *assumed* "160x optimized
// C++/TBB over NumPy-oracle" factor in bench.py's vs_baseline with a measured
// ns/cell/step number for the reference's own CPU implementation.
//
// Build + run: see scripts/refbaseline/build_and_run.sh
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include "BimocqSolver2D.h"

int main(int argc, char **argv) {
    // example-0 parameters (reference src/bimocq2D/main.cpp:45-57)
    int nx = 256, ny = 256;
    float dt = 0.025f;
    int N = 4;
    float L = 2.f * M_PI;
    float vorticity_distance = 0.81f;
    float blend_coeff = 1.f;
    bool PURE_NEUMANN = false;
    int scheme = (argc > 1) ? atoi(argv[1]) : 7;  // 7 = BIMOCQ (BimocqSolver2D.h:18)
    int warm = (argc > 2) ? atoi(argv[2]) : 2;
    int frames = (argc > 3) ? atoi(argv[3]) : 20;

    Scheme sim_scheme = static_cast<Scheme>(scheme);
    BimocqSolver2D sim(nx, ny, L, blend_coeff, N, PURE_NEUMANN, sim_scheme);
    sim.setSmoke(0.f, 0.f);
    sim.buildMultiGrid(PURE_NEUMANN);
    sim.setInitVelocity(vorticity_distance);
    sim.sampleParticlesFromGrid();

    for (int i = 0; i < warm; i++) sim.advance(dt, i);

    auto t0 = std::chrono::steady_clock::now();
    for (int i = warm; i < warm + frames; i++) sim.advance(dt, i);
    auto t1 = std::chrono::steady_clock::now();

    double ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / frames;
    double ns_per_cell = ms * 1e6 / (double(nx) * ny);
    printf("{\"scheme\": %d, \"nx\": %d, \"ny\": %d, \"frames\": %d, "
           "\"ms_per_frame\": %.3f, \"ns_per_cell\": %.2f}\n",
           scheme, nx, ny, frames, ms, ns_per_cell);
    return 0;
}
