// State-parity harness for the experimental HyperBitBit: reads
// "<prefix>,<n>" lines on stdin, offers prefix0..prefix(n-1) to a
// fresh reference HyperBitBit, prints "lgN,sketch,sketch2,cardinality".
// Lives in the reference's package for direct package-private field
// access (compiled by tests/test_hyperbitbit.py, never shipped).
package com.clearspring.experimental.stream.cardinality;

import java.io.BufferedReader;
import java.io.InputStreamReader;

public class HbbGolden {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            String[] parts = line.split(",");
            String prefix = parts[0];
            int n = Integer.parseInt(parts[1]);
            HyperBitBit hbb = new HyperBitBit();
            for (int i = 0; i < n; i++) {
                hbb.offer(prefix + i);
            }
            System.out.println(hbb.lgN + "," + hbb.sketch + "," + hbb.sketch2
                    + "," + hbb.cardinality());
        }
    }
}
