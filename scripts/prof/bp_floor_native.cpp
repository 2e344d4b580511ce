// BP error-floor reproduction on the reference's numeric type.
//
// Fresh implementation of textbook flooding sum-product decoding in the
// phi-domain on `long double` (x87 80-bit), matching the reference's
// conventions — NOT a copy of its Tanner-graph object code:
//   phi(x) = -log(tanh(x/2)) unclamped          (reference algo/bp.h:34)
//   check:  sign-product x phi(sum of phi(|.|))  (algo/bp.h:49-57)
//   var:    channel llr + extrinsic sum          (algo/bp.h:77-90)
//   decision: estimate <= 0 -> bit 1             (algo/bp.h:193)
//   sign:   t <= 0 -> -1                         (algo/bp.h:82)
//   per-iteration syndrome early exit            (algo/bp.h:191-196)
//
// With --clamp, phi's argument is clamped to [1e-9, 31] — our production
// policy (ldpc_tpu/ops/phi.py) — which removes the inf/NaN saturation
// artifact and with it the high-SNR error floor.
//
// Driven by scripts/prof/prof_bp_floor_native.py (which generates the
// channel draws with the framework's channel model and compares FERs).
//
// Usage: bp_floor_native H.txt llrs.txt codewords.txt max_iter clamp(0|1)
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

using namespace std;

typedef long double ld;

static bool g_clamp = false;

static ld phi(ld x) {
    if (g_clamp) {
        if (x < 1e-9L) x = 1e-9L;
        if (x > 31.0L) x = 31.0L;
    }
    return -logl(tanhl(x / 2.0L));
}

int main(int argc, char **argv) {
    if (argc < 6) {
        fprintf(stderr, "usage: %s H llrs codewords max_iter clamp\n",
                argv[0]);
        return 2;
    }
    int max_iter = atoi(argv[4]);
    g_clamp = atoi(argv[5]) != 0;

    // H: comma-separated 0/1 rows (the reference data format)
    vector<vector<int>> row_cols;   // support of each check row
    vector<vector<int>> col_rows;   // checks incident to each variable
    int n = 0;
    {
        ifstream f(argv[1]);
        string line;
        while (getline(f, line)) {
            if (line.empty()) continue;
            vector<int> sup;
            int col = 0;
            for (size_t i = 0; i < line.size(); i++) {
                if (line[i] == '0' || line[i] == '1') {
                    if (line[i] == '1') sup.push_back(col);
                    col++;
                }
            }
            n = col;
            row_cols.push_back(sup);
        }
    }
    int m = (int)row_cols.size();
    col_rows.assign(n, {});
    for (int r = 0; r < m; r++)
        for (int c : row_cols[r]) col_rows[c].push_back(r);

    ifstream fl(argv[2]), fc(argv[3]);
    string lline, cline;
    long total = 0, fails = 0, nan_fails = 0;
    vector<ld> llr(n), est(n);
    vector<int> bits(n), cw(n);
    // c2v messages indexed by (row, position-in-row)
    vector<vector<ld>> c2v(m);
    for (int r = 0; r < m; r++) c2v[r].assign(row_cols[r].size(), 0.0L);

    while (getline(fl, lline) && getline(fc, cline)) {
        {
            istringstream ss(lline);
            for (int i = 0; i < n; i++) ss >> llr[i];
        }
        {
            int k = 0;
            for (size_t i = 0; i < cline.size() && k < n; i++)
                if (cline[i] == '0' || cline[i] == '1')
                    cw[k++] = cline[i] - '0';
        }
        for (int r = 0; r < m; r++)
            fill(c2v[r].begin(), c2v[r].end(), 0.0L);
        bool ok = false, saw_nan = false;
        for (int it = 0; it < max_iter && !ok; it++) {
            // extrinsic totals per variable
            for (int v = 0; v < n; v++) {
                ld s = llr[v];
                for (int r : col_rows[v]) {
                    size_t p = 0;
                    while (row_cols[r][p] != v) p++;
                    s += c2v[r][p];
                }
                est[v] = s;
            }
            // check update from v2c = est - own c2v (extrinsic)
            for (int r = 0; r < m; r++) {
                size_t d = row_cols[r].size();
                vector<ld> pm(d);
                vector<int> sg(d);
                for (size_t p = 0; p < d; p++) {
                    ld t = est[row_cols[r][p]] - c2v[r][p];
                    pm[p] = phi(fabsl(t));
                    sg[p] = (t <= 0) ? -1 : 1;   // bp.h:82 convention
                }
                for (size_t p = 0; p < d; p++) {
                    ld sum = 0;
                    int sgn = 1;
                    for (size_t q = 0; q < d; q++)
                        if (q != p) { sum += pm[q]; sgn *= sg[q]; }
                    c2v[r][p] = sgn * phi(sum);
                }
            }
            // decision + syndrome (early exit, bp.h:191-196)
            for (int v = 0; v < n; v++) {
                ld s = llr[v];
                for (int r : col_rows[v]) {
                    size_t p = 0;
                    while (row_cols[r][p] != v) p++;
                    s += c2v[r][p];
                }
                if (isnanl(s)) saw_nan = true;
                bits[v] = (s <= 0) ? 1 : 0;
            }
            ok = true;
            for (int r = 0; r < m && ok; r++) {
                int par = 0;
                for (int c : row_cols[r]) par ^= bits[c];
                if (par) ok = false;
            }
        }
        bool correct = ok && equal(bits.begin(), bits.end(), cw.begin());
        total++;
        if (!correct) {
            fails++;
            if (saw_nan) nan_fails++;
        }
    }
    printf("{\"clamp\": %d, \"total\": %ld, \"fails\": %ld, "
           "\"nan_fails\": %ld, \"fer\": %.6f}\n",
           g_clamp ? 1 : 0, total, fails, nan_fails,
           (double)fails / (double)total);
    return 0;
}
