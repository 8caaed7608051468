import com.clearspring.analytics.stream.frequency.CountMinSketch;
import com.clearspring.analytics.stream.membership.BloomFilter;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.util.Base64;

// Reverse-direction harness for the reference-hash-family BUILD mode:
// the compiled reference deserializes CMS / Bloom blobs OUR Spark jobs
// wrote and answers probes with ITS OWN hash family.  stdin lines:
//   cms_string,<base64 blob>,<probe;probe;...>
//   cms_long,<base64 blob>,<probe;probe;...>
//   bloom,<base64 blob>,<probe;probe;...>
// stdout: one line per input, ';'-joined estimateCount / isPresent(0|1).
public class ReadBack3 {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) {
                continue;
            }
            String[] parts = line.split(",", 3);
            byte[] blob = Base64.getDecoder().decode(parts[1]);
            String[] probes = parts[2].split(";");
            StringBuilder out = new StringBuilder();
            if (parts[0].equals("bloom")) {
                BloomFilter bf = BloomFilter.deserialize(blob);
                for (String p : probes) {
                    out.append(bf.isPresent(p) ? 1 : 0).append(";");
                }
            } else {
                CountMinSketch c = CountMinSketch.deserialize(blob);
                for (String p : probes) {
                    long est = parts[0].equals("cms_long")
                            ? c.estimateCount(Long.parseLong(p))
                            : c.estimateCount(p);
                    out.append(est).append(";");
                }
            }
            System.out.println(out.substring(0, out.length() - 1));
        }
    }
}
