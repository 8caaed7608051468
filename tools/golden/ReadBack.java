import com.clearspring.analytics.stream.cardinality.CountThenEstimate;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.util.Base64;

// Interop read-back harness: each stdin line is base64 of a
// CountThenEstimate wire blob (produced by OUR codec); the REFERENCE
// deserializes it and reports what it sees.
public class ReadBack {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isBlank()) continue;
            CountThenEstimate cte = new CountThenEstimate(Base64.getDecoder().decode(line.trim()));
            System.out.println(cte.tipped() + "," + cte.cardinality());
        }
    }
}
